"""Resident single-probe radius-search session — the daemon-service analog.

The reference runs a long-lived server holding a singleton in-process BK-tree
and answers one pHash probe per RPC (`single_phash_search` /
`processDownload`, /root/reference/server/server.py:31-53; tree reload at
:136-144). The batch analog in this repo is operators/banded_join.
banded_radius_search — correct, but it re-explodes the corpus into its band
table on EVERY call, which is the wrong shape for an interactive "is this
new download a dup?" probe stream.

ProbeSession is the resident index: explode the corpus once into the banded
layout, hash-repartition it on (band_id, band_key) — the same layout the
join-based search shuffles into — and persist it. A probe then computes its
own band keys DRIVER-SIDE (functions/hashing.band_keys_np, the bit-exact
numpy mirror of the JVM band expression) and runs a narrow filter +
bit_count verify over the cached table: no corpus re-scan, no shuffle, no
join. At cluster scale the persisted band table lives across executors and a
probe is one short cached-scan job; on a 12M-hash corpus this is the
moral equivalent of the reference's ~5 GB resident tree (README.md:15-16),
except the "tree" is just cached DataFrame state with no driver memory cost.

Mutation follows the repo-wide immutable-snapshot discipline (SURVEY §2.9:
RW locks are n/a by design): insert()/remove() build a NEW persisted band
table and atomically swap the reference, mirroring the reference server's
whole-tree reload rather than its fine-grained locked inserts. The old
snapshot is unpersisted after the swap; in-flight probes on it still
complete (Spark caches are refcounted by plan, not mutated in place).

Every result is verified exact Hamming distance — same contract as
banded_radius_search, differentially pinned against it in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ..config import bands_for_radius
from ..functions.hashing import band_keys_np
from ..operators.banded_join import explode_bands


class ProbeSession:
    """Resident banded index over (id, sig); answers Hamming-radius probes.

    Parameters mirror banded_radius_search: `radius` is the session's max
    supported radius (n_bands > radius gives pigeonhole-exact recall for
    every probe radius <= it, per-probe override allowed downward).
    """

    def __init__(
        self,
        corpus: DataFrame,
        radius: int,
        id_col: str = "id",
        sig_col: str = "sig",
        n_bands: int | None = None,
        n_partitions: int | None = None,
    ) -> None:
        self.radius = radius
        self.n_bands = n_bands or bands_for_radius(radius)
        if self.n_bands <= radius:
            raise ValueError(
                f"need n_bands > radius for full recall "
                f"({self.n_bands} <= {radius})"
            )
        self.spark: SparkSession = corpus.sparkSession
        self._id_col, self._sig_col = id_col, sig_col
        self._n_partitions = n_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        self._bands = self._build(
            corpus.select(
                F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig")
            )
        )

    # -- internals ---------------------------------------------------------

    def _build(self, slim: DataFrame) -> DataFrame:
        bands = (
            explode_bands(
                slim.filter(F.col("_sig").isNotNull()), "_id", "_sig", self.n_bands
            )
            # one combined probe key: band_key is a LOGICAL (zero-fill) slice
            # of <= 32 bits, so band_id * 2^33 + band_key is collision-free
            # and monotone in (band_id, band_key) — a probe is then a single
            # long-column IN filter instead of an 8-way two-column OR
            # (measured ~2x cheaper per probe at 1M sigs), and
            # sortWithinPartitions on it gives cached batches tight min/max
            # stats for InMemoryTableScan batch pruning
            .withColumn(
                "_bk",
                F.col("band_id").cast("long") * F.lit(1 << 33) + F.col("band_key"),
            )
            .repartition(self._n_partitions, "band_id", "band_key")
            .sortWithinPartitions("_bk")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        bands.count()  # materialize NOW: probe latency must not pay the build
        return bands

    def _swap(self, slim: DataFrame) -> None:
        old = self._bands
        # Cut lineage BEFORE building: `slim` reads the outgoing snapshot, so
        # without a checkpoint every mutation nests the previous snapshot's
        # plan — O(mutations) Catalyst analysis cost per probe on a long-lived
        # session, and a lost cache block would recompute through every prior
        # snapshot. localCheckpoint materializes the slim (2-long-column) rows
        # and roots the new band table at a LogicalRDD: constant plan depth
        # per snapshot. The checkpoint blocks stay referenced by the new band
        # table's lineage and are GC-freed with it (ContextCleaner).
        slim = slim.localCheckpoint(eager=True)
        self._bands = self._build(slim)
        old.unpersist()

    def _slim(self) -> DataFrame:
        """Current corpus rows (one per id) recovered from the band table."""
        return self._bands.filter(F.col("band_id") == 0).select("_id", "_sig")

    # -- queries -----------------------------------------------------------

    def search(self, sig: int, radius: int | None = None) -> list[tuple[int, int]]:
        """[(match_id, distance)] within `radius` of `sig`, sorted by
        (distance, id). The single-probe RPC shape (single_phash_search):
        band keys computed driver-side, one cached-scan filter job."""
        r = self.radius if radius is None else radius
        if r > self.radius:
            raise ValueError(
                f"probe radius {r} > session radius {self.radius} "
                f"(recall guarantee needs n_bands > radius)"
            )
        keys = band_keys_np(np.array([sig], dtype=np.int64), self.n_bands)[0]
        bks = [
            (band_id << 33) + int(key) for band_id, key in enumerate(keys.tolist())
        ]
        rows = (
            self._bands.filter(F.col("_bk").isin(bks))
            .withColumn(
                "distance",
                F.bit_count(F.col("_sig").bitwiseXOR(F.lit(int(sig)))),
            )
            .filter(F.col("distance") <= r)
            .select("_id", "distance")
            .collect()
        )
        # one id can collide in several bands (same exact distance each
        # time); dedup driver-side — a groupBy would add a whole shuffle
        # stage to every probe for at most n_bands duplicate rows per match.
        # Nearest-first (distance, then id), per the contract above: result[0]
        # must be the closest match, not the lowest id.
        return sorted(
            {(r_["_id"], r_["distance"]) for r_ in rows},
            key=lambda t: (t[1], t[0]),
        )

    def search_batch(
        self,
        queries: DataFrame,
        query_id: str = "id",
        query_sig: str = "sig",
        radius: int | None = None,
    ) -> DataFrame:
        """(q_id, match_id, distance): the batched probe shape, joined
        against the RESIDENT band table (queries explode + broadcast; the
        corpus side stays cached and pre-partitioned)."""
        r = self.radius if radius is None else radius
        if r > self.radius:
            raise ValueError(
                f"probe radius {r} > session radius {self.radius}"
            )
        qb = explode_bands(
            queries.filter(F.col(query_sig).isNotNull()),
            query_id,
            query_sig,
            self.n_bands,
        ).select(
            "band_id",
            "band_key",
            F.col("_id").alias("q_id"),
            F.col("_sig").alias("q_sig"),
        )
        return (
            self._bands.join(F.broadcast(qb), ["band_id", "band_key"])
            .withColumn(
                "distance",
                F.bit_count(F.col("q_sig").bitwiseXOR(F.col("_sig"))),
            )
            .filter(F.col("distance") <= r)
            .select("q_id", F.col("_id").alias("match_id"), "distance")
            .dropDuplicates(["q_id", "match_id"])
        )

    # -- mutation (immutable-snapshot semantics) ----------------------------

    def insert(self, rows: DataFrame) -> None:
        """Add (id, sig) rows and swap in a fresh snapshot (J8 analog; the
        reference's locked per-item tree insert becomes a whole-snapshot
        rebuild — the honest Spark-native trade, same as catalog MERGE)."""
        add = rows.select(
            F.col(self._id_col).alias("_id"), F.col(self._sig_col).alias("_sig")
        )
        self._swap(self._slim().unionByName(add))

    def remove(self, ids: list[int]) -> None:
        """Drop ids from the index (J9 analog)."""
        self._swap(
            self._slim().filter(~F.col("_id").isin([int(i) for i in ids]))
        )

    def refresh(self, corpus: DataFrame) -> None:
        """Full reload from a new corpus snapshot (the server's periodic
        tree reload, /root/reference/server/server.py:136-144)."""
        self._swap(
            corpus.select(
                F.col(self._id_col).alias("_id"),
                F.col(self._sig_col).alias("_sig"),
            )
        )

    def size(self) -> int:
        return self._bands.count() // self.n_bands

    def close(self) -> None:
        self._bands.unpersist()
