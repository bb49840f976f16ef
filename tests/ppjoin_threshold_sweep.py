import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from opentick_spark.session import get_spark
from opentick_spark.operators.dedup import prefix_jaccard_candidates, prefix_filter_jaccard_pairs
spark = get_spark(app_name="ppjoin_thresh", shuffle_partitions=64, driver_memory="8g")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
for t in (0.5, 0.6, 0.7):
    cp = prefix_jaccard_candidates(docs, threshold=t, positional_filter=True).count()
    cn = prefix_jaccard_candidates(docs, threshold=t, positional_filter=False).count()
    t0 = time.time(); np_ = prefix_filter_jaccard_pairs(docs, threshold=t, positional_filter=True).count(); tp = time.time()-t0
    t0 = time.time(); nn = prefix_filter_jaccard_pairs(docs, threshold=t, positional_filter=False).count(); tn = time.time()-t0
    print(json.dumps({"threshold": t, "cand_pos": cp, "cand_plain": cn,
                      "reduction_pct": round(100*(cn-cp)/max(cn,1),1),
                      "t_pos": round(tp,1), "t_plain": round(tn,1),
                      "pairs": np_, "pairs_match": np_ == nn}), flush=True)
