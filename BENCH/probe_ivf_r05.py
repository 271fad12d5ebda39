"""r04 verdict #3: probe the ivf_topk_embeddings regression
(0.903s r03 -> 1.157s r04 driver bench) with the Addendum-4
interleaved protocol.

Decomposition: the query is a chain of separately-actionable jobs —
  qvec   : embeddings.where(vec_id==0).first()        (1 job)
  assign : ivf_assign -> assignments materialized      (TakeOrdered +
           window-over-8 + broadcast crossJoin + per-id window)
  collect: centroids.collect()                         (tiny)
  probe  : join + cosine + orderBy.limit(k)            (1-2 stages)

Protocol: N interleaved rounds; each round times the FULL query and
each component in randomized-free fixed order (full, qvec, assign,
probe), so drift hits all arms equally. Report per-arm medians. If
sum(component medians) ~= full median and every arm is dominated by
multi-stage launch cost (wall >> task-time), the regression is fixed
overhead, same as minhash/cluster in REGRESSION_r04 Addendum 4.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from schema_guru_spark.operators import similarity as SIM  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROUNDS = 7

spark = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .appName("probe_ivf_r05").getOrCreate())

emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
emb.count()  # warm footers


def t(fn):
    s = time.perf_counter()
    fn()
    return time.perf_counter() - s


def full():
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    SIM.ivf_topk(emb, qvec, "embedding", "vec_id", k=10,
                 n_centroids=8, n_probe=8).collect()


def qvec_only():
    emb.where(F.col("vec_id") == 0).first()


def assign_only():
    a, c = SIM.ivf_assign(emb, "embedding", "vec_id", n_centroids=8)
    a.count()
    c.collect()


_QV = emb.where(F.col("vec_id") == 0).first()["embedding"]
_A, _C = SIM.ivf_assign(emb, "embedding", "vec_id", n_centroids=8)
# materialize so the probe arm measures probe cost only (the at-scale
# shape: assignments live in the bucketed table layout, not the plan)
_A = _A.localCheckpoint()
_C = _C.localCheckpoint()


def probe_only():
    SIM.ivf_topk(emb, _QV, "embedding", "vec_id", k=10,
                 n_centroids=8, n_probe=8,
                 assignments=_A, centroids=_C).collect()


arms = {"full": full, "qvec": qvec_only, "assign": assign_only,
        "probe": probe_only}
samples = {k: [] for k in arms}
# one untimed warm pass per arm
for fn in arms.values():
    fn()
for _ in range(N_ROUNDS):
    for name, fn in arms.items():
        samples[name].append(t(fn))

out = {name: {"median": round(statistics.median(v), 3),
              "min": round(min(v), 3), "max": round(max(v), 3)}
       for name, v in samples.items()}
out["loadavg_1m"] = round(os.getloadavg()[0], 2)
out["sf_dir"] = SF
print(json.dumps(out))
spark.stop()
