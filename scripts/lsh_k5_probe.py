"""k=5-shingle probe (r11 verdict #1's second named mitigation) at
sf10: does widening the shingle from 3 to 5 words collapse the
mid-similarity pair mass that dominates candidate volume on the
Heaps fixture? Composed from package functions with sh/shf injection;
no package change. NOTE: 5-gram Jaccard is a DIFFERENT measure (the
truth set itself moves), so this is a mechanism probe, not a
drop-in operating point."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from apd_map_reduce_spark.session import get_spark, release_caches
from apd_map_reduce_spark.operators.dedup import (
    tokenized_docs, word_shingles, stop_shingle_filter,
    lsh_collision_multiplicity, ngram_jaccard_pairs, NEARDUP_THRESHOLD)
from apd_map_reduce_spark.plans.layout import explode_nonnull

spark = get_spark(app_name="k5-probe")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/repo/.scale/sf10/documents.parquet")

def shingle_hashes_n(docs, n):
    hashed = F.array_distinct(F.transform(
        word_shingles(F.col("ts"), n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")))
    return explode_nonnull(tokenized_docs(docs), ["doc_id"], hashed, "sh")

out = {}
for n in (3, 5):
    sh = shingle_hashes_n(docs, n).cache()
    shf = stop_shingle_filter(sh).cache()
    t0 = time.monotonic()
    mult = lsh_collision_multiplicity(docs, shf=shf)
    stats = mult.agg(F.sum("n_bands").alias("bpr"), F.count(F.lit(1)).alias("nc")).collect()[0]
    # true-pair count at this shingle width (threshold 0.5) on a 1/8 slice
    sl = docs.filter(F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),1,4),16,10) % 8 == 0)
    slsh = shingle_hashes_n(sl, n).cache()
    nt = ngram_jaccard_pairs(sl, threshold=NEARDUP_THRESHOLD, sh=slsh).count()
    out[f"n{n}"] = {"band_pair_rows": int(stats.bpr or 0), "n_candidates": int(stats.nc),
                    "slice_true_pairs_thr05": nt, "sec": round(time.monotonic()-t0,1)}
    print(n, out[f"n{n}"], flush=True)
    release_caches(spark)
json.dump(out, open("/tmp/k5_probe.json","w"), indent=1)
