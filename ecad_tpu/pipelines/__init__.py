from .pixart_pipeline import (
    PixArtPipeline,
    PixArtPipelineConfig,
    PopulationDenoiser,
    SharedModelStepper,
)
from .samplers import (
    DPMSolverSchedule,
    DPMState,
    FlowMatchSchedule,
    dpm_step,
    flow_step,
    make_dpm_schedule,
    make_flow_schedule,
)

__all__ = [
    "PixArtPipeline",
    "PopulationDenoiser",
    "PixArtPipelineConfig",
    "SharedModelStepper",
    "DPMSolverSchedule",
    "DPMState",
    "dpm_step",
    "make_dpm_schedule",
    "FlowMatchSchedule",
    "flow_step",
    "make_flow_schedule",
]
