"""I/O, persistence and config layer (SURVEY.md §2.3): binary capture
readers with native threaded loading + prefetch, xcorr results database,
group database, and the INI config system."""

from pydsproutines_tpu.io.binfiles import (
    simple_bin_read,
    multi_bin_read,
    is_int16_clipping,
    FolderReader,
    SortedFolderReader,
    GroupReader,
    GroupDatabase,
    StreamingCaptureLoader,
)
from pydsproutines_tpu.io.xcorrdb import XcorrDB
from pydsproutines_tpu.io.config import (
    DSPConfig,
    SourceSection,
    SignalSection,
    ProcessingSection,
    WorkspaceSection,
)

__all__ = [
    "simple_bin_read",
    "multi_bin_read",
    "is_int16_clipping",
    "FolderReader",
    "SortedFolderReader",
    "GroupReader",
    "GroupDatabase",
    "StreamingCaptureLoader",
    "XcorrDB",
    "DSPConfig",
    "SourceSection",
    "SignalSection",
    "ProcessingSection",
    "WorkspaceSection",
]
