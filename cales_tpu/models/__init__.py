"""Canonical flow-case builders (the framework's "model families").

Each returns a ready-to-run Config mirroring the reference's example cases
(/root/reference/examples/dns, /root/reference/examples/les); everything is
driven purely by BC strings + parameters, no per-case solver code
(SURVEY.md §0).
"""
from .cases import (  # noqa: F401
    triperiodic_dns,
    taylor_green_2d,
    taylor_green_3d,
    channel_dns,
    channel_les,
    channel_wmles,
    half_channel,
    couette,
    lid_driven_cavity,
    spanwise_cavity,
    square_duct_les,
    temporal_boundary_layer,
    developing_channel,
)
