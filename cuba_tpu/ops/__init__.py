"""Core batched math ops (quaternions, SE3, projection, Jacobians, robust
kernels, fixed-size symmetric solves).  Everything here is shape-polymorphic
over leading batch dimensions and jit/vmap friendly."""
