"""Temporal ball tracking (Kalman track bank over fusion centroids)."""

from tod_tpu.track.tracker import (
    TrackerConfig,
    init_tracks,
    shift_tracks,
    track_update,
    track_update_oracle,
    tracks_to_balls,
)

__all__ = [
    "TrackerConfig",
    "init_tracks",
    "shift_tracks",
    "track_update",
    "track_update_oracle",
    "tracks_to_balls",
]
