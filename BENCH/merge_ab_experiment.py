"""A/B: two collect_sets (current) vs one combined-struct collect_set
split post-agg, on the real bench corpus at sf0.1 cardinalities.
Alternating back-to-back trials so host weather hits both variants."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark import StorageLevel
from pyspark.sql import functions as F
from auth2wd_spark.session import build_session
from auth2wd_spark.corpus.generate import distributed_corpus
from auth2wd_spark.operators.extract import extract_pages
from auth2wd_spark.operators.linking import link
from auth2wd_spark.operators.cc import assign_components, build_edges, connected_components
from auth2wd_spark.operators.merge import _stated_in_expr, _CLAIM_KEY

spark = build_session(app_name="merge-ab", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
corpus = distributed_corpus(spark, n_persons=200_000, noise_pages=20_000, include_fixtures=True)
pages = corpus["pages"].persist(StorageLevel.MEMORY_AND_DISK); pages.count()
dims = {k: corpus[k].persist() for k in ("id_to_qid","viaf_lookup","valid_gnd_ids")}
for d in dims.values(): d.count()
raw = extract_pages(pages)
triples = link(raw, dims["id_to_qid"], dims["viaf_lookup"], dims["valid_gnd_ids"]).localCheckpoint()
labels = connected_components(build_edges(triples))
with_comp = assign_components(triples, labels).persist(StorageLevel.MEMORY_AND_DISK)
n = with_comp.count()
print("with_comp rows:", n, flush=True)

claims = with_comp.filter(F.col("kind") == "claim")
ref = F.when(F.col("has_ref"), F.struct(
    _stated_in_expr().alias("stated_in"),
    F.concat(F.lit("P"), F.col("src_property").cast("string")).alias("src_prop"),
    F.col("src_id").alias("src_id")))
qual_key = F.when(F.col("pred") == "P225", F.lit("")).otherwise(F.col("qualifiers"))
keyed = claims.withColumn("ref", ref).withColumn("qual_key", qual_key)
depr = F.max(F.when(F.col("rank") == "deprecated", 1).otherwise(0)).alias("any_depr")

def variant_a():
    return keyed.groupBy(*_CLAIM_KEY).agg(
        F.min_by("qualifiers", F.struct("subj","ord")).alias("qualifiers"),
        depr,
        F.array_sort(F.collect_set("ref")).alias("references"),
        F.array_sort(F.collect_set("src_url")).alias("src_urls"),
        F.min(F.struct("subj","ord")).alias("first_seen"))

def variant_b():
    g = keyed.groupBy(*_CLAIM_KEY).agg(
        F.min_by("qualifiers", F.struct("subj","ord")).alias("qualifiers"),
        depr,
        F.array_sort(F.collect_set(F.struct(F.col("ref"), F.col("src_url")))).alias("pairs"),
        F.min(F.struct("subj","ord")).alias("first_seen"))
    return g.select(
        *_CLAIM_KEY, "qualifiers", "any_depr",
        F.array_sort(F.array_distinct(F.filter(
            F.transform("pairs", lambda p: p["ref"]), lambda r: r.isNotNull()))).alias("references"),
        F.array_sort(F.array_distinct(
            F.transform("pairs", lambda p: p["src_url"]))).alias("src_urls"),
        "first_seen")

def force(df):
    df.write.format("noop").mode("overwrite").save()

# warmup both once
force(variant_a()); force(variant_b())
times = {"A": [], "B": []}
for rep in range(3):
    for name, fn in (("A", variant_a), ("B", variant_b)):
        t0 = time.perf_counter(); force(fn()); dt = time.perf_counter()-t0
        times[name].append(round(dt,2)); print(rep, name, round(dt,2), flush=True)
print("A:", times["A"], "min", min(times["A"]))
print("B:", times["B"], "min", min(times["B"]))
# equivalence check on output
import pandas as pd
a = variant_a().orderBy(*_CLAIM_KEY).toPandas()
b = variant_b().orderBy(*_CLAIM_KEY)[a.columns.tolist()].toPandas()
print("equivalent:", a.astype(str).equals(b.astype(str)))
spark.stop()
