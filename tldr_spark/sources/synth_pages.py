"""Deterministic Common-Crawl-style pages generator (FIXTURES.md §1).

Schema = BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Generated DISTRIBUTED — a seeded
per-row kernel over ``spark.range`` via mapInPandas, so a 10^12-row table is
the same code with a bigger range; no driver-side materialization, no
wall-clock, no network.

Link structure: out-degree ~ Zipf(a≈1.3, cap) so out-hub skew is real;
targets drawn with preferential attachment toward low page ids (in-degree
hubs). The ``text`` column is pre-filled with ``extract_text_py(html)`` —
the byte-identical invariant is therefore testable by re-extracting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_WORDS = (
    "museum architect lucas star wars collection landscape bridge design "
    "artist gallery city shoreline field sets ruins towns empire product "
    "table throne bed blueprint rebel parking site suburb office building "
    "glass material story vision honor roundup feature culture memorabilia"
).split()

EPOCH_NS = 1_767_225_600_000_000_000  # 2026-01-01T00:00:00Z, fixed (no now())


def _page_url(site: int, k: int) -> str:
    return f"https://site{site}.example/p/{k}"


def _gen_batch(ids: np.ndarray, n_pages: int, n_sites: int, zipf_a: float, cap: int) -> pd.DataFrame:
    rows = []
    pages_per_site = max(1, n_pages // n_sites)
    for pid in ids:
        rng = np.random.default_rng(42 + int(pid))  # per-row seed: order-independent
        site, k = int(pid) // pages_per_site, int(pid) % pages_per_site
        url = _page_url(site, k)
        out_deg = min(int(rng.zipf(zipf_a)), cap)
        # preferential attachment toward low ids: id ~ floor(U^2 * n)
        targets = np.unique((rng.random(out_deg) ** 2 * n_pages).astype(np.int64))
        targets = targets[targets != pid]
        n_par = int(rng.integers(1, 4))
        paras = [
            " ".join(rng.choice(_WORDS, size=rng.integers(6, 18)).tolist()) + "."
            for _ in range(n_par)
        ]
        anchors = "\n".join(
            f'<a href="{_page_url(int(t) // pages_per_site, int(t) % pages_per_site)}">w{t}</a>'
            for t in targets
        )
        lang = "en" if pid % 20 < 19 else ("de" if pid % 2 == 0 else "fr")
        html = (
            f"<html><head><title>page {pid}</title><style>p{{x}}</style></head>\n"
            f"<body>\n<p>{'</p><p>'.join(paras)}</p>\n{anchors}\n"
            f"<script>var x=1;</script></body></html>"
        ).encode("utf-8")
        from tldr_spark.functions.text_udfs import extract_text_py

        ts = pd.Timestamp(EPOCH_NS + int(pid) * 1_000_000_000)
        rows.append((url, ts, html, extract_text_py(html), lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_sites: int | None = None,
    zipf_a: float = 1.3,
    out_deg_cap: int = 200,
    num_partitions: int | None = None,
) -> DataFrame:
    n_sites = n_sites or max(1, n_pages // 10)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), n_pages, n_sites, zipf_a, out_deg_cap)

    rng_df = spark.range(n_pages, numPartitions=num_partitions)
    return rng_df.mapInPandas(gen, SCHEMA)


def vertex_ids(links: DataFrame, method: str = "hash") -> DataFrame:
    """(url, id) mapping for the vertex set of a (src_url, dst_url) table.

    method="hash": id = xxhash64(url) — no shuffle beyond the distinct, no
    global sort, stable across runs/cluster sizes (checkpoint-resume safe).
    Collision odds at 10^12 vertices are ~n²/2^65; production would widen to
    a 128-bit digest, the relational shape is identical.

    method="dense": dense 0..V-1 ids via a DataFrame-native distributed
    two-pass — per-partition counts (one small collect), then
    offset + per-partition local row_number. NO single-partition
    Window.orderBy sort (the canonical scale mistake for this job) and no
    RDD hop (rows stay JVM-side; the old zipWithIndex round-tripped every
    row through Python). Hash-partitioning on url + url-ordered local ranks
    makes the assignment deterministic for a fixed shuffle partition count.
    Use when a downstream consumer needs dense ids.
    """
    from pyspark.sql import Window, functions as F

    verts = (
        links.select(F.col("src_url").alias("url"))
        .union(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    if method == "hash":
        return verts.select("url", F.xxhash64("url").alias("id"))
    spark = links.sparkSession
    vp = (
        verts.repartition(F.col("url"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in vp.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy("url")
    out = (
        vp.join(F.broadcast(off_df), "_pid")
        .select("url", (F.col("_off") + F.row_number().over(w) - 1).alias("id"))
        .localCheckpoint(eager=True)
    )
    vp.unpersist()
    return out


def pages_to_edges(pages: DataFrame, id_method: str = "hash") -> DataFrame:
    """pages → (src, dst, weight=1.0) link-graph edges: href extraction
    (pandas UDF, Arrow) → explode → url normalization → vertex ids."""
    from pyspark.sql import functions as F

    from tldr_spark.functions.text_udfs import extract_links, normalize_url

    links = (
        pages.select(
            normalize_url(F.col("url")).alias("src_url"),
            F.explode(extract_links(F.col("html"))).alias("dst_raw"),
        )
        .select("src_url", normalize_url(F.col("dst_raw")).alias("dst_url"))
    )
    if id_method == "hash":
        # no vertex-table join at all — ids computed inline, zero shuffles
        return links.select(
            F.xxhash64("src_url").alias("src"),
            F.xxhash64("dst_url").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    verts = vertex_ids(links, id_method)
    src_map = verts.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_map = verts.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    return (
        links.join(src_map, "src_url")
        .join(dst_map, "dst_url")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


def url_host(col):
    """Lowercased host (authority) of a URL, pure JVM regexp — no UDF.
    The character class mirrors RFC 3986's authority delimiters; the same
    pattern is RE2-safe for DuckDB-side test mirrors."""
    from pyspark.sql import functions as F

    return F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))


def pages_to_host_edges(pages: DataFrame) -> DataFrame:
    """pages → host-level link graph (src_host, dst_host, n_links): href
    extraction (Arrow-batched pandas UDF over html), then both endpoints
    collapsed to their lowercased URL host, self-host links dropped, link
    multiplicity aggregated.

    This is the standard Common-Crawl host-graph rollup (the published CC
    host/domain-level webgraph construction): at 10^12 pages the page graph
    has ~10^13 edges but only ~10^8 hosts, so host collapse is the first
    aggregation any web-scale link analysis runs — one shuffle on
    (src_host, dst_host), host extraction stays JVM-side, and the result is
    small enough to broadcast into downstream joins."""
    from pyspark.sql import functions as F

    from tldr_spark.functions.text_udfs import extract_links

    links = pages.select(
        url_host(F.col("url")).alias("src_host"),
        F.explode(extract_links(F.col("html"))).alias("dst_raw"),
    ).select("src_host", url_host(F.col("dst_raw")).alias("dst_host"))
    return (
        links.filter(
            (F.col("src_host") != "") & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
