"""End-to-end pipelines ("models"): composed receiver chains built from the
ops layer, mirroring the reference's implied processing pipeline
(SURVEY.md §3.6): capture -> channelize -> detect -> xcorr -> demod."""

from pydsproutines_tpu.models.receiver import WidebandReceiver
from pydsproutines_tpu.models.pipeline import CheckpointedXcorrPipeline

__all__ = ["WidebandReceiver", "CheckpointedXcorrPipeline"]
