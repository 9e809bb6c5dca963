"""Pipeline plans: end-to-end job runners composed from the operator library."""
