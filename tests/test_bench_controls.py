"""r16 (VERDICT r15 item 2): the bench control rows must stay
CODE-FROZEN to mean anything — r15 edited two of the eight
(mjpg_frame_stats, image_exif_audit) without retiring them, which
contaminated the exact ambient-drift instrument the r14 verdict
ordered. This gate makes the dict's comment rule assertable: every
control row pins a hash of its registry function's source; editing the
function without retiring (or consciously re-pinning) the row fails
the suite. The hash is deliberately conservative — a comment-only edit
trips it too, forcing the retire-or-repin decision to be explicit in
the diff."""

from __future__ import annotations

import hashlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sha256(getsource)[:16] of each control row's registry function at its
# r16 pin (session_windows/adj_forward replaced the retired
# mjpg_frame_stats/image_exif_audit; the other six are pinned at their
# long-frozen r13-era source).
_PINNED_SOURCE = {
    "full_scan_agg": "563637c0f5ad2dc2",
    "pk_range_scan": "c471effdb0cc770a",
    "tail_limit": "8e3311875c41650c",
    "pricing_summary": "6de7dda226e10036",
    "revenue_by_nation": "018447b422c16c78",
    "ohlcv_rollup": "0ebc69388b7b043c",
    "session_windows": "5aeff271fffd05bc",
    "adj_forward": "d9e84cdff7a8e6dd",
}

# rows whose code THIS round touched (r16) — must never be controls
_R16_TOUCHED = {
    "video_clip_containment_grouped",
    "video_clip_containment",
    "mjpg_frame_stats",
    "dup_span_stats",
    "image_exif_audit",  # r15-touched, stays retired
}


def test_control_rows_match_pin_exactly():
    import bench

    assert set(bench._CONTROL_REFERENCE) == set(_PINNED_SOURCE)


def test_control_rows_disjoint_from_touched_set():
    import bench

    assert not (set(bench._CONTROL_REFERENCE) & _R16_TOUCHED)


def test_control_row_sources_frozen():
    from opentick_spark.workload import ALL_QUERIES

    drift = {}
    for name, pinned in _PINNED_SOURCE.items():
        fn = ALL_QUERIES[name]
        h = hashlib.sha256(inspect.getsource(fn).encode()).hexdigest()[:16]
        if h != pinned:
            drift[name] = h
    assert not drift, (
        "control-row registry source changed — retire the row from "
        f"bench._CONTROL_REFERENCE or consciously re-pin: {drift}"
    )
