"""Low-level numeric ops: bijectors, packed-triangular utilities, kernels, ODE solvers."""
