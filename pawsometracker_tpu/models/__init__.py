"""Model family: tracker specifications and their jitted device functions."""

from .dog_tracker import TrackerSpec, TrackerFns, autodetect_spec, center_guess, make_spec, tracker_fns
