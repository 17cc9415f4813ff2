"""Diffusion processes, schedules and samplers."""

from .schedule import (  # noqa: F401
    DDIMSchedule,
    NoiseSchedule,
    linear_betas,
    linear_sqrt_betas,
    make_ddim_schedule,
    make_schedule,
)
