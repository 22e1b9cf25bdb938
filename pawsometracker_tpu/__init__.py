"""PawsomeTracker-TPU — a TPU-native single-target video auto-tracker.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
yakir12/PawsomeTracker.jl: follow one blob-like target through a video with a
Difference-of-Gaussians matched filter evaluated in a search window around the
previous position. Host-side native decode feeds chunked uint8 frames to a
jitted ``lax.scan``; batches of videos scale across TPU chips via
``jax.sharding`` over a device mesh.

Public surface: :func:`track` (the reference's sole export,
reference: src/PawsomeTracker.jl:26), plus the batch/sharded APIs, tracker
model internals, and I/O layers for power users.
"""

from .utils.compilecache import enable_persistent_cache

# amortize XLA compiles across processes (opt out: PAWS_TPU_NO_COMPILE_CACHE=1)
enable_persistent_cache()

from .api import DEFAULT_MAX_DURATION_SECONDS, IJ, track
from .batch import track_batch
from .checkpoint import load_checkpoint, track_resumable
from .multi import track_multi
from .diagnose import Diagnose, Dont, diagnose
from .parallel.mesh import (
    ShardedBatchTracker,
    global_detect_batch,
    global_detect_peaks,
    make_mesh,
)
from .models.dog_tracker import TrackerSpec, autodetect_spec, make_spec, tracker_fns
from .ops.dog_kernel import (
    dog_kernel_2d,
    fix_window_size,
    get_sigma,
    guess_window_size,
)

__version__ = "0.4.0"

__all__ = [
    "track",
    "track_batch",
    "track_resumable",
    "track_multi",
    "load_checkpoint",
    "make_mesh",
    "ShardedBatchTracker",
    "global_detect_batch",
    "global_detect_peaks",
    "IJ",
    "DEFAULT_MAX_DURATION_SECONDS",
    "TrackerSpec",
    "tracker_fns",
    "make_spec",
    "autodetect_spec",
    "get_sigma",
    "guess_window_size",
    "fix_window_size",
    "dog_kernel_2d",
    "Diagnose",
    "Dont",
    "diagnose",
    "__version__",
]
