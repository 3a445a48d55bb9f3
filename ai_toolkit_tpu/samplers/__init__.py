from .flowmatch import FlowMatchSchedule, calculate_flux_shift
from .ddpm import DDPMSchedule
from .factory import get_schedule

__all__ = ["FlowMatchSchedule", "DDPMSchedule", "get_schedule", "calculate_flux_shift"]
