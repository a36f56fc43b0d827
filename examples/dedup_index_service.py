"""Incremental dedup/search index service over a growing corpus:

1. BUILD a persistent MinHash-LSH index and an IVF vector index over
   the initial corpus (even doc/vec ids);
2. a STREAM of new documents maintains the LSH index via foreachBatch
   (O(batch) appends, frozen params);
3. the vector index absorbs new embeddings against FROZEN centroids;
4. QUERIES: near-dup candidates for a probe batch + top-k vector
   neighbors, both from the persisted state;
5. drift monitoring: IVF cell occupancy;
6. TAKEDOWN: tombstone doc/vector ids (O(delta) append — queries
   exclude them immediately), then compact/vacuum to remove the rows
   physically and clear the tombstones.

The operating model: indexing work is O(new data) per increment, no
maintenance ever touches previously-indexed rows, and queries prune by
(band, bucket) / cell partition. Run:
    python examples/dedup_index_service.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import Tables
from sparkflow_spark.lsh_index import (
    build_lsh_index,
    compact_lsh_index,
    delete_from_lsh_index,
    query_lsh_index,
)
from sparkflow_spark.session import build_session
from sparkflow_spark.streaming.sinks import stream_append_to_lsh_index
from sparkflow_spark.vector_index import (
    append_to_ivf_index,
    build_ivf_index,
    cell_occupancy,
    delete_from_ivf_index,
    query_ivf_index,
    vacuum_ivf_index,
)


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = build_session(app_name="dedup_index_service", master="local[8]")
    t = Tables(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="index_service_")
    lsh_path, ivf_path = os.path.join(work, "lsh"), os.path.join(work, "ivf")
    try:
        docs = t.documents.select("doc_id", "text")
        vecs = t.embeddings.select("vec_id", "embedding").where(
            F.col("embedding").isNotNull()
        )

        # 1) initial build over the even-id halves
        build_lsh_index(docs.filter(F.col("doc_id") % 2 == 0), lsh_path)
        build_ivf_index(vecs.filter(F.col("vec_id") % 2 == 0), ivf_path, n_centroids=8)

        # 2) stream the odd-id docs in as "new arrivals"
        arrivals = os.path.join(work, "arrivals")
        docs.filter(F.col("doc_id") % 2 == 1).repartition(3).write.parquet(arrivals)
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(arrivals)
        )
        stream_append_to_lsh_index(sdf, lsh_path).awaitTermination()

        # 3) vector delta against frozen centroids
        append_to_ivf_index(spark, ivf_path, vecs.filter(F.col("vec_id") % 2 == 1))

        # 4) queries from persisted state
        probes = docs.orderBy("doc_id").limit(10)
        dups = query_lsh_index(spark, lsh_path, probes, min_est_jaccard=0.5)
        print(f"near-dup candidates for 10 probes: {dups.count()}")
        vprobes = vecs.orderBy("vec_id").limit(5).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        nn = query_ivf_index(spark, ivf_path, vprobes, k=3, n_probe=4)
        print("top-3 neighbors per probe:")
        for r in nn.orderBy("probe_id", "rnk").collect():
            print(f"  probe {r['probe_id']} -> {r['id']} (cos {r['cosine']:.3f})")

        # 5) drift monitor
        occ = cell_occupancy(spark, ivf_path).orderBy("cell").collect()
        print("IVF cell occupancy:", {r["cell"]: r["n"] for r in occ})

        # 6) takedown: remove two docs and two vectors. The tombstone
        # append is O(delta); queries exclude the ids immediately, and
        # compaction/vacuum makes the removal physical (equivalent to
        # never having indexed them — hash-checked by the registry's
        # d_lsh_takedown_md5_query).
        victims = [r["match_id"] for r in dups.limit(2).collect()]
        if victims:
            delete_from_lsh_index(
                spark, lsh_path, spark.createDataFrame([(v,) for v in victims], "doc_id long")
            )
            after = query_lsh_index(spark, lsh_path, probes, min_est_jaccard=0.5)
            print(f"after takedown of {victims}: {after.count()} candidates")
            stats = compact_lsh_index(spark, lsh_path)
            print("compaction folded tombstones:", stats.get("tombstoned_ids", 0))
        vec_victims = [r["id"] for r in nn.limit(2).collect()]
        delete_from_ivf_index(
            spark, ivf_path, spark.createDataFrame([(v,) for v in vec_victims], "vec_id long")
        )
        print("vacuumed vectors:", vacuum_ivf_index(spark, ivf_path))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
