"""Sampling layer: timestep schedules, CFG wrappers, Euler ODE integration.

Rebuild of ref zipvoice/models/modules/solver.py; see sampling/euler.py.
"""

from zipvoice_tpu.sampling.euler import (  # noqa: F401
    cfg_velocity,
    euler_sample,
    get_time_steps,
)

__all__ = ["cfg_velocity", "euler_sample", "get_time_steps"]
