"""Shared 10x-synthesis recipes for the scale drills (r12 review
finding: two drills had verbatim copies of the documents recipe, which
would silently diverge on a fixture-schema change).

The recipes mirror scaling_sf1.synth_sf1's per-table rules: documents
replicate with a replica-suffix (NEAR duplicates, realistic dedup
structure; n_chars recomputed), events extend the time range 10x at
constant density (time-bucketed aggs grow in groups, not group size).
"""

import os

SF01 = "/root/testdata/sf0.1"


def synth_documents_10x(dst: str, src_dir: str = SF01) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    docs = pq.read_table(os.path.join(src_dir, "documents.parquet")).to_pandas()
    parts = []
    for r in range(10):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 10_000_000
        if r > 0:
            d["text"] = d["text"] + f" replica{r}"
            d["n_chars"] = d["text"].str.len()
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False
        ),
        os.path.join(dst, "documents.parquet"),
    )


def synth_events_10x(dst: str, src_dir: str = SF01) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    ev = pq.read_table(os.path.join(src_dir, "events.parquet")).to_pandas()
    span = (ev["ts"].max() - ev["ts"].min()) + pd.Timedelta(hours=1)
    parts = []
    for r in range(10):
        e = ev.copy()
        e["event_id"] = e["event_id"] + r * 100_000_000
        e["ts"] = e["ts"] + r * span
        parts.append(e)
    pq.write_table(
        pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False
        ),
        os.path.join(dst, "events.parquet"),
    )
