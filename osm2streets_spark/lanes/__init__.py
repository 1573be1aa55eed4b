from .inference import get_lane_specs_ltr, LaneSpec, lanes_to_chars, dirs_to_chars  # noqa: F401
