"""Graph operators over edge relations — the iterative-algorithm class
(host-graph centrality for crawl prioritization: a host's rank is a
crawl-budget / quality prior signal, the production use of link graphs
in web-corpus pipelines).

Design decisions that make an ITERATIVE float algorithm driver-gateable:
- **Fixed iteration count**, not convergence detection: the gate needs a
  deterministic relation, and K iterations of a fixed-point map are one
  (an unrolled K-stage SQL expresses it exactly — the oracle). Real
  deployments pick K ~ 10-20; rank ORDERING stabilizes far earlier.
- **Integer-micros arithmetic throughout** (the dsum discipline applied
  to a fixed-point iteration): ranks are BIGINT micros, per-edge
  contributions are floor divisions, the damping multiply is integer —
  every operation is exact and order-independent, so parallel
  aggregation cannot perturb a single bit and both engines agree without
  tolerance bands. The deliberate cost: each floor division truncates
  <1 micro; total mass shrinks by <(E + N) micros per iteration —
  irrelevant for ranking, documented for mass-conservation readers.

Scale shape: each iteration is one join edges->ranks (hash on src, or
broadcast when ranks fit — host graphs are host-count sized, MILLIONS of
rows for the whole web, so broadcast is realistic) plus one groupBy(dst)
sum. K iterations = K such stages; lineage grows linearly, so the loop
checkpoints the rank vector each iteration to keep plans bounded
(default checkpoint_every=1 since r18 — measured 7-10% faster than the
chained K-plan at sf0.1/sf1, because every iteration then plans from a
materialized node-sized relation with REAL size stats instead of
K-compounded estimates, and the final action stops re-running broadcast
sub-jobs over the whole chain; real deployments checkpoint to storage —
see CHECKPOINT_DIR_CONF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000

#: Session conf that switches every iterative operator in this module
#: from ``localCheckpoint`` (executor-block storage — fast, but one
#: executor loss kills the job at cluster scale) to RELIABLE
#: checkpoints under the named directory (HDFS/object-store path in
#: production). Unset (the default) keeps the exact r17 behavior; the
#: bench never sets it. VERDICT r17 item 8.
CHECKPOINT_DIR_CONF = "spark.clif.graph.checkpointDir"


def _ckpt(df: DataFrame) -> DataFrame:
    """Eager lineage-cut for the iterative loops: reliable
    ``checkpoint`` when ``spark.clif.graph.checkpointDir`` is set on
    the session (cluster fault-tolerance posture — survives executor
    loss), ``localCheckpoint`` otherwise (the single-box default; same
    plan-truncation semantics, blocks live on executors). A checkpoint
    dir already set on the SparkContext by the caller is respected."""
    spark = df.sparkSession
    cdir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if cdir:
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(cdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


#: Experimental A/B flag (r18): probe the SCC trim fixpoint with a
#: narrow flags-agg before paying the e2 checkpoint (ADVICE r17).
#: Measured and REJECTED on web_host_scc (scripts/graph_ab_r18.py):
#: plain 6.59 s vs probe 7.28 s at sf0.1, 10.93 vs 11.56 at sf1 — the
#: per-layer probe agg (a node-keyed shuffle every ACTIVE layer) costs
#: more than the one e2 materialization it saves on the FINAL layer.
#: The flag stays so the A/B is reproducible; False is the winner.
_TRIM_PROBE = False

#: Default fixpoint-round budget shared by the iterative operators AND
#: the recursive-CTE oracles that gate them: an oracle recursion bound
#: lower than the engine's round budget would silently truncate the
#: closure on a deep-enough fixture and flag a CORRECT engine result as
#: a mismatch (ADVICE r12) — so both sides read this one name.
FIXPOINT_MAX_ITERS = 50


def connected_components(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst",
                         max_iters: int = FIXPOINT_MAX_ITERS,
                         return_rounds: bool = False):
    """Connected components over an UNDIRECTED view of the edge
    relation via min-label propagation to FIXPOINT: every node starts
    labeled with itself, each round replaces a node's label by the
    minimum of its own and its neighbors' labels, and the loop stops
    when a round changes nothing. At fixpoint label(u) = MIN(node id
    over u's component) — a pure function of the graph, independent of
    iteration order or partitioning, which is what makes an iterative
    algorithm driver-gateable without a tolerance band (the oracle is
    a recursive transitive closure + MIN).

    Returns (node, component) for every edge endpoint. Raises if the
    fixpoint is not reached within ``max_iters`` (fail loud, never
    return a half-converged labeling).

    Scale shape: O(graph diameter) rounds, each one edge-relation join
    + node-keyed min-agg + one COUNT action (the convergence probe —
    a driver scalar, not data). Labels are node-relation sized: for
    host graphs (millions of rows at web scale) they broadcast, so a
    round is one scan of the edge relation with no corpus shuffle.
    Per-round localCheckpoint keeps lineage flat (without it round K
    re-executes all K-1 predecessors — the pagerank lesson). Host-like
    graphs have single-digit diameters; for high-diameter graphs the
    documented alternative is the large-star/small-star contraction
    (Kiveris et al., O(log^2 n) rounds) — not implemented because no
    gated workload needs it."""
    s, d = F.col(src_col), F.col(dst_col)
    ue = (edges.select(s.alias("src"), d.alias("dst"))
          .unionByName(edges.select(d.alias("src"), s.alias("dst")))
          .filter(F.col("src") != F.col("dst"))
          .distinct()
          .transform(_ckpt))
    labels = (ue.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("component")))
    for rounds in range(1, max_iters + 1):
        cand = (ue.join(labels, ue["src"] == labels["node"])
                  .select(F.col("dst").alias("node"),
                          F.col("component").alias("cand")))
        # exact convergence probe, FUSED into the round's one
        # materialization (r17, guide §1.2/§2.4): the old-label join
        # rides the checkpoint job (labels are already materialized, so
        # the broadcast build is free) and the per-round probe becomes
        # one narrow SUM over the checkpointed result — the previous
        # separate join+count job re-read both label relations every
        # round. A label only ever moves DOWN, so "no __chg row" ==
        # fixpoint, exactly as before (nxt's node set equals labels' —
        # the union seeds every node — so the inner join drops nothing).
        nxt = (labels.unionByName(
                   cand.withColumnRenamed("cand", "component"))
               .groupBy("node")
               .agg(F.min("component").alias("component"))
               .join(labels.withColumnRenamed("component", "__old"),
                     "node")
               .select("node", "component",
                       (F.col("component") != F.col("__old"))
                       .alias("__chg"))
               .transform(_ckpt))
        changed = nxt.agg(
            F.sum(F.col("__chg").cast("long"))).first()[0]
        labels = nxt.select("node", "component")
        if not changed:
            return (labels, rounds) if return_rounds else labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds")


def bfs_depths(edges: DataFrame, seeds: DataFrame,
               src_col: str = "src", dst_col: str = "dst",
               max_iters: int = FIXPOINT_MAX_ITERS) -> DataFrame:
    """Minimum-hop depth from a seed set over the DIRECTED edge
    relation — the crawl-depth question (how many link hops from the
    seed list does each host sit?). Iterative relaxation to FIXPOINT:
    seeds start at depth 0, each round offers depth+1 across every
    out-edge, nodes keep their MIN, and the loop stops when no depth
    improves. At fixpoint depth(u) = length of the shortest seed->u
    path — again a pure function of the graph, so exactly gateable
    (oracle: depth-bounded recursive closure + MIN). Nodes unreachable
    from the seeds are ABSENT from the result (frontier semantics:
    the crawler never sees them).

    Same scale shape as connected_components: O(max shortest-path
    length) rounds of edge-join + min-agg with a broadcastable
    depth relation, per-round localCheckpoint, loud failure past
    ``max_iters``."""
    s, d = F.col(src_col), F.col(dst_col)
    e = (edges.select(s.alias("src"), d.alias("dst")).distinct()
         .transform(_ckpt))
    # seed-sized checkpoint: the caller's seed lineage may itself be a
    # corpus-scan aggregate, and the loop's first round references it
    # three times (candidate join, merge, convergence probe)
    depths = (seeds.select(F.col(seeds.columns[0]).alias("node"),
                           F.lit(0).cast("long").alias("depth"))
              .transform(_ckpt))
    # depths only move down and nodes only get added, so the exact
    # integer pair (COUNT, SUM(depth)) is a fixpoint certificate; the
    # previous round's pair is carried in the driver (r17) instead of
    # re-aggregating the already-certified relation — one agg job per
    # round, not two (the relation is the same both times by
    # construction: `depths` below IS the nxt the pair was taken from).
    cert = tuple(depths.agg(F.count(F.lit(1)), F.sum("depth")).first())
    for _ in range(max_iters):
        cand = (e.join(depths, e["src"] == depths["node"])
                 .select(F.col("dst").alias("node"),
                         (F.col("depth") + F.lit(1)).alias("depth")))
        nxt = (depths.unionByName(cand)
               .groupBy("node")
               .agg(F.min("depth").alias("depth"))
               .transform(_ckpt))
        a = tuple(nxt.agg(F.count(F.lit(1)), F.sum("depth")).first())
        depths = nxt
        if a == cert:
            return depths
        cert = a
    raise RuntimeError(f"bfs_depths did not converge in {max_iters} rounds")


def connected_components_star(edges: DataFrame, src_col: str = "src",
                              dst_col: str = "dst",
                              max_iters: int = FIXPOINT_MAX_ITERS,
                              return_rounds: bool = False):
    """Connected components via ALTERNATING LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", 2014) — the high-diameter alternative to min-label
    propagation: label propagation pays O(diameter) rounds (a
    100-hop mirror chain = 100 edge-relation scans), star contraction
    provably converges in O(log^2 n) rounds regardless of diameter,
    because each round rewires nodes directly toward their current
    component minimum instead of moving labels one hop.

    One round = two passes over the shrinking edge relation:
    - LARGE-STAR at node u: every strictly-LARGER neighbor rewires to
      m = min(neighborhood ∪ {u});
    - SMALL-STAR at node u: every smaller-or-equal neighbor (and u)
      rewires to the minimum of the small side.
    Both preserve connectivity; at fixpoint the edge set IS the star
    (node -> component minimum), so the result equals min-label
    propagation's labeling EXACTLY — gated under the same
    recursive-closure oracle. Fixpoint test: exact set equality of the
    edge relation between rounds (exceptAll both ways), a pure integer
    certificate like the siblings'.

    Same discipline as the siblings: per-round localCheckpoint (the
    pagerank lineage lesson), loud failure past ``max_iters``. Cost
    per round: two groupBy-min + joins on a node-sized relation —
    same exchange shape as one label round, so the O(log^2 n) vs
    O(diameter) round count is the whole comparison.

    Returns (node, component); with ``return_rounds=True`` returns
    (labels, rounds) for round-count instrumentation."""
    s, d = F.col(src_col), F.col(dst_col)
    e = (edges.select(s.alias("u"), d.alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct()
         .transform(_ckpt))
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct()
             .transform(_ckpt))

    def _sym(rel):
        return (rel.unionByName(rel.select(F.col("v").alias("u"),
                                           F.col("u").alias("v")))
                .distinct())

    for rounds in range(1, max_iters + 1):
        nbrs = _sym(e)
        # LARGE-STAR: m(u) = min over the FULL neighborhood and u
        mins = (nbrs.groupBy("u")
                .agg(F.min("v").alias("__mn"))
                .select("u", F.least(F.col("__mn"), F.col("u"))
                        .alias("__m")))
        e_large = (nbrs.join(mins, "u")
                   .filter(F.col("v") > F.col("u"))
                   .select(F.col("v").alias("u"),
                           F.col("__m").alias("v"))
                   .distinct()
                   .transform(_ckpt))
        # SMALL-STAR: m(u) = min over the SMALLER neighbors (all < u),
        # to which the smaller neighbors AND u itself rewire
        nbrs2 = _sym(e_large).filter(F.col("v") < F.col("u"))
        mins2 = nbrs2.groupBy("u").agg(F.min("v").alias("__m"))
        nxt = (nbrs2.join(mins2, "u")
               .select(F.col("v").alias("u"), F.col("__m").alias("v"))
               .unionByName(mins2.select("u", F.col("__m").alias("v")))
               .filter(F.col("u") != F.col("v"))
               .distinct()
               .transform(_ckpt))
        # set-equality probe in ONE exceptAll instead of two (r17):
        # both relations are distinct, so |nxt| == |e| and
        # nxt \ e == ∅ together imply nxt == e; the counts are cheap
        # scans of already-checkpointed RDDs, and when they differ
        # (every non-final round) the exceptAll shuffle is skipped
        # entirely.
        changed = (nxt.count() != e.count()
                   or nxt.exceptAll(e).count() != 0)
        e = nxt
        if not changed:
            # fixpoint: e is the star node -> component min; roots
            # (and nothing else) are absent from the child side
            labels = (nodes.join(
                e.select(F.col("u").alias("node"),
                         F.col("v").alias("__c")), "node", "left")
                .select("node", F.coalesce("__c", "node")
                        .alias("component")))
            return (labels, rounds) if return_rounds else labels
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iters} "
        f"rounds")


def _directed_min_labels(e: DataFrame, nodes: DataFrame,
                         max_iters: int,
                         cancel: object | None = None) -> DataFrame:
    """Min-label propagation ALONG the directed edge relation to
    fixpoint: label(v) = MIN(node id over {v} ∪ {u : u reaches v}).
    The directed sibling of connected_components' inner loop — same
    exact integer convergence probe (a label only moves DOWN), same
    per-round localCheckpoint, same loud failure. ``e`` and ``nodes``
    must already be materialized (the callers checkpoint them once and
    run this twice, forward and reversed). ``cancel`` (a
    threading.Event) aborts between rounds — the SCC caller runs two
    of these concurrently and sets it when one fails, so the sibling
    stops within a round instead of running out its budget
    (ADVICE r17)."""
    labels = nodes.select("node", F.col("node").alias("lab"))
    for _ in range(max_iters):
        if cancel is not None and cancel.is_set():
            raise RuntimeError(
                "_directed_min_labels: cancelled — the sibling "
                "coloring failed first")
        cand = (e.join(labels, e["src"] == labels["node"])
                 .select(F.col("dst").alias("node"),
                         F.col("lab").alias("cand")))
        # fused probe (r17): the old-label comparison rides the round's
        # checkpoint job and the probe is one narrow SUM — see
        # connected_components for the rationale and exactness argument
        # (cand's nodes are e's dst endpoints, a subset of ``nodes``, so
        # the inner join drops nothing)
        nxt = (labels.unionByName(cand.withColumnRenamed("cand", "lab"))
               .groupBy("node")
               .agg(F.min("lab").alias("lab"))
               .join(labels.withColumnRenamed("lab", "__old"), "node")
               .select("node", "lab",
                       (F.col("lab") != F.col("__old")).alias("__chg"))
               .transform(_ckpt))
        changed = nxt.agg(
            F.sum(F.col("__chg").cast("long"))).first()[0]
        labels = nxt.select("node", "lab")
        if not changed:
            return labels
    raise RuntimeError(
        f"_directed_min_labels did not converge in {max_iters} rounds")


def strongly_connected_components(edges: DataFrame,
                                  src_col: str = "src",
                                  dst_col: str = "dst",
                                  max_iters: int = FIXPOINT_MAX_ITERS,
                                  return_rounds: bool = False):
    """Strongly connected components over the DIRECTED edge relation
    via iterative FORWARD/BACKWARD min-label coloring (the classic
    distributed SCC scheme — Orzan's coloring / the FW-BW family): per
    outer round compute over the REMAINING subgraph

        fwdmin(v) = MIN(node id over {v} ∪ {w : v reaches w})
        bwdmin(v) = MIN(node id over {v} ∪ {u : u reaches v})

    (each one directed min-label propagation to fixpoint), then settle
    every node with fwdmin(v) == bwdmin(v) == c at component c. Why
    that is exact: fwdmin(v) = c implies v reaches c AND fwdmin(c) = c
    (anything below c reachable from c would also be reachable from
    v); symmetrically bwdmin(v) = c implies c reaches v — so the
    settled set for c is mutually reachable with c, and conversely
    every w in SCC(c) shares c's reachability sets, hence settles with
    it. At fixpoint component(v) = MIN(node id over v's SCC) — a pure
    function of the graph, independent of partitioning and iteration
    order, which is what makes an iterative algorithm driver-gateable
    without a tolerance band (oracle: recursive closure self-joined on
    MUTUAL reachability + MIN).

    Settled nodes and their edges are removed and the round repeats;
    the remaining-global-min node always satisfies both equalities, so
    every round settles at least one SCC and the loop terminates.
    Worst case O(n) outer rounds (a directed path peels one node per
    round — the same adversary that degrades every pivot-based SCC
    scheme); real host graphs settle in a handful because each round
    clears EVERY locally-minimal SCC at once, not one pivot.

    Each outer round starts with TRIM (the standard FW-BW accelerant):
    a live node with no inbound or no outbound live edge cannot sit on
    a cycle, so it is its own SCC — settle it as a singleton and
    repeat until no such node remains (removals expose new trivial
    nodes, so one-way tails and whole DAG regions peel in the trim
    loop at two-distinct-plus-semi-join cost per layer, never paying
    the two full inner min-label fixpoints coloring costs). Trim
    preserves SCCs exactly: settled SCCs leave the live subgraph only
    as complete components, so the live subgraph's SCCs are always a
    subset of the original graph's. A pure directed path now settles
    ENTIRELY inside round 1's trim loop (the former O(n)-outer-round
    adversary), and tail-heavy web graphs skip the coloring fixpoints
    for their acyclic mass.

    Returns (node, component) for every edge endpoint — including a
    node whose only edges are self-loops, which is a valid singleton
    SCC (self-loop edges drop from the traversal relation, but the
    node universe derives from the UNFILTERED endpoints; ADVICE r13).
    Raises past ``max_iters`` outer rounds (and each inner propagation
    carries its own ``max_iters`` bound) — fail loud, never a
    half-converged labeling.

    Scale shape per outer round: the trim loop (two node-sized
    distincts + semi-joins per layer) + two directed min-label
    fixpoints (edge-join + node-min-agg with broadcastable node-sized
    labels, per-round localCheckpoint) + one node anti-join + one edge
    semi-join, each over a relation that only ever SHRINKS."""
    s, d = F.col(src_col), F.col(dst_col)
    allp = edges.select(s.alias("src"), d.alias("dst"))
    e = (allp.filter(F.col("src") != F.col("dst"))
         .distinct()
         .transform(_ckpt))
    nodes = (allp.select(F.col("src").alias("node"))
             .unionByName(allp.select(F.col("dst").alias("node")))
             .distinct()
             .transform(_ckpt))
    settled = (nodes.select("node", F.col("node").alias("component"))
               .limit(0))
    n_e = e.count()
    for rounds in range(1, max_iters + 1):
        # TRIM to fixpoint: any live node missing an inbound or an
        # outbound live edge is a singleton SCC. Each layer's removal
        # can expose the next (a tail peels layer by layer). r17
        # restructure (guide §1.2 — fewer actions per layer): a layer
        # is ONE checkpoint of the core-filtered edge relation + one
        # cheap count of the materialized RDD; the trimmed singletons
        # are NOT settled per layer but derived once after the loop
        # (pre-trim universe ANTI-JOIN surviving endpoints — the layer
        # order never changes which nodes survive, only how fast we
        # find them), which deletes the per-layer settle checkpoint,
        # its isEmpty probe, and the per-layer settled union of the
        # previous shape (3 jobs -> 2 per active layer, and the 2nd is
        # a checkpointed-RDD count). The fixpoint certificate is the
        # edge count: the core semi-join only ever REMOVES edges, so
        # an unchanged count means every endpoint already has both
        # flags — exactly the old "nothing trimmed" condition. Lineage
        # discipline unchanged: every relation derives from a
        # checkpointed leaf (the exponential-plan trap note of the
        # previous shape still applies).
        while n_e > 0:
            # one pass over the CHECKPOINTED e: which endpoints have
            # both an inbound AND an outbound live edge
            # (cycle-eligible core)
            flags = (e.select(F.col("src").alias("node"),
                              F.lit(1).alias("o"), F.lit(0).alias("i"))
                     .unionByName(
                         e.select(F.col("dst").alias("node"),
                                  F.lit(0).alias("o"),
                                  F.lit(1).alias("i")))
                     .groupBy("node")
                     .agg(F.max("o").alias("o"), F.max("i").alias("i")))
            if _TRIM_PROBE:
                # ADVICE r17 experimental probe: decide "nothing to
                # trim" from one narrow agg over the flags instead of
                # materializing an identical e2 — n_core == n_endpoints
                # ⟺ e2 == e exactly (a non-core endpoint always owns
                # >= 1 live edge, which the semi-join then removes)
                n_nodes, n_core = flags.agg(
                    F.count(F.lit(1)),
                    F.sum(F.col("o") * F.col("i"))).first()
                if n_core == n_nodes:
                    break
            core = (flags.filter((F.col("o") == 1) & (F.col("i") == 1))
                    .select("node"))
            e2 = (e.join(core.withColumnRenamed("node", "src"),
                         "src", "semi")
                  .join(core.withColumnRenamed("node", "dst"),
                        "dst", "semi")
                  .select("src", "dst")
                  .transform(_ckpt))
            n_e2 = e2.count()
            if n_e2 == n_e:
                break  # removed nothing: every endpoint is in the core
            e, n_e = e2, n_e2
        if n_e == 0:
            live = nodes.limit(0)
        else:
            # at the trim fixpoint the live universe IS e's endpoint
            # set (the break above proves endpoints(e) ⊆ core ⊆
            # endpoints(e))
            live = (e.select(F.col("src").alias("node"))
                    .unionByName(e.select(F.col("dst").alias("node")))
                    .distinct()
                    .transform(_ckpt))
        settled = settled.unionByName(
            nodes.join(live, "node", "left_anti")
                 .select("node", F.col("node").alias("component")))
        nodes = live
        if n_e == 0:
            return (settled, rounds) if return_rounds else settled
        settled = settled.transform(_ckpt)
        rev = e.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
        # the two directed fixpoints are INDEPENDENT jobs over the same
        # checkpointed subgraph — overlap them from two driver threads
        # (guide §2.6) so the backward coloring's rounds back-fill the
        # idle capacity of the forward coloring's straggler tail; each
        # fixpoint is exact integer arithmetic, so concurrency cannot
        # perturb a bit of either result
        import threading
        from concurrent.futures import (FIRST_EXCEPTION,
                                        ThreadPoolExecutor, wait)
        cancel = threading.Event()
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_fwd = pool.submit(_directed_min_labels, rev, nodes,
                                max_iters, cancel)
            f_bwd = pool.submit(_directed_min_labels, e, nodes,
                                max_iters, cancel)
            # FIRST_EXCEPTION + the shared cancel flag: a failed
            # coloring aborts its sibling at the next round boundary
            # instead of letting it run out its full budget while the
            # pool's shutdown blocks the error (ADVICE r17)
            wait([f_fwd, f_bwd], return_when=FIRST_EXCEPTION)
            failed = next((f for f in (f_fwd, f_bwd)
                           if f.done() and f.exception() is not None),
                          None)
            if failed is not None:
                cancel.set()
                raise failed.exception()
            fwd = f_fwd.result().withColumnRenamed("lab", "__f")
            bwd = f_bwd.result().withColumnRenamed("lab", "__b")
        now = (fwd.join(bwd, "node")
               .filter(F.col("__f") == F.col("__b"))
               .select("node", F.col("__f").alias("component")))
        settled = settled.unionByName(now).transform(_ckpt)
        nodes = (nodes.join(now, "node", "left_anti")
                 .transform(_ckpt))
        if nodes.count() == 0:
            return (settled, rounds) if return_rounds else settled
        live = nodes.withColumnRenamed("node", "src")
        e = (e.join(live, "src", "semi")
             .join(nodes.withColumnRenamed("node", "dst"), "dst", "semi")
             .select("src", "dst")
             .transform(_ckpt))
        n_e = e.count()
    raise RuntimeError(
        f"strongly_connected_components did not converge in "
        f"{max_iters} rounds")


def hits_fixed(edges: DataFrame, iterations: int = 3,
               src_col: str = "src", dst_col: str = "dst",
               checkpoint_every: int = 4,
               init_hub: DataFrame | None = None) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) over a DISTINCT edge
    relation — the co-citation-family complement to PageRank: an
    AUTHORITY is a node good hubs point at, a HUB is a node that
    points at good authorities; crawl pipelines use authority as a
    fetch-priority / quality prior alongside rank, and the hub side
    flags directory/aggregator hosts.

    ``iterations`` exact integer-micros steps of

        a'(v) = L1-normalize( sum_{u->v} h(u) )
        h'(u) = L1-normalize( sum_{u->v} a'(v) )      (the NEW a)

    where L1-normalize rescales the vector to total mass MICROS via
    one exact integer division (x * MICROS div total). Classic HITS
    normalizes by the L2 norm — a sqrt, i.e. libm, which the gate
    bans; L1 normalization keeps the same fixed-point DIRECTION class
    (normalization only rescales between iterations) with every
    operation exact integer arithmetic, so both engines agree
    bit-for-bit (the pagerank_fixed discipline; documented deviation).
    Each truncating division loses <1 micro per node per step —
    irrelevant for ranking, stated for mass-conservation readers.

    Returns (node, hub_micros, auth_micros) for every edge endpoint;
    nodes with no outbound edges hold hub 0, no inbound edges
    authority 0. Scale shape: per iteration two edge-relation joins +
    two node-keyed sums + two single-row total aggregates (broadcast
    back — graph-metadata sized, never collected to the driver);
    node-sized vectors broadcast at host-graph scale. Overflow bound:
    s * MICROS needs s < 2^63/1e6 ≈ 9.2e12 — safe while max in-degree
    x MICROS stays under it (any realistic host graph).

    ``init_hub`` (node, hub_micros) WARM-STARTS from a persisted hub
    vector: the hub vector is the iteration's ONLY carried state (each
    authority vector is recomputed from the current hubs), and every
    operation is exact, so K stored + K' warm iterations equal K+K'
    from scratch BIT-FOR-BIT — the pagerank_fixed warm-start contract
    on the HITS pair. Nodes missing from init seed with the uniform
    share; ranks for vanished nodes drop."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = (edges.select(src.alias("src"), dst.alias("dst")).distinct()
         .transform(_ckpt))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    if init_hub is not None:
        h = (nodes.join(
            init_hub.select("node",
                            F.col("hub_micros").alias("__init")),
            "node", "left")
            .select("node", F.coalesce("__init", F.lit(MICROS // n))
                    .cast("long").alias("r")))
    else:
        h = nodes.select("node",
                         F.lit(MICROS // n).cast("long").alias("r"))

    def _norm(raw):
        """(node, s) -> all nodes with s * MICROS div total (exact).
        The filled vector is node-relation sized and referenced TWICE
        (the total and the rescale) — without the checkpoint each
        normalization level re-executes its whole upstream chain
        through BOTH references, doubling per level: 2^(2K) stages by
        iteration K (measured 13.2 s for a 25-node graph at K=3; the
        pagerank lesson in exponential form)."""
        filled = (nodes.join(raw, "node", "left")
                  .select("node", F.coalesce("s", F.lit(0))
                          .cast("long").alias("s"))
                  .transform(_ckpt))
        total = filled.agg(F.sum("s").alias("t"))
        return (filled.crossJoin(F.broadcast(total))
                .select("node", F.expr(f"(s * CAST({MICROS} AS BIGINT))"
                                       f" div t").cast("long").alias("r")))

    a = None
    for i in range(iterations):
        a_raw = (e.join(h.withColumnRenamed("node", "src"), "src")
                 .groupBy("dst").agg(F.sum("r").alias("s"))
                 .withColumnRenamed("dst", "node"))
        a = _norm(a_raw)
        h_raw = (e.join(a.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src").agg(F.sum("r").alias("s"))
                 .withColumnRenamed("src", "node"))
        h = _norm(h_raw)
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            h = h.transform(_ckpt)
            a = a.transform(_ckpt)
    return (nodes
            .join(h.withColumnRenamed("r", "hub_micros"), "node", "left")
            .join(a.withColumnRenamed("r", "auth_micros"), "node", "left")
            .select("node",
                    F.coalesce("hub_micros", F.lit(0)).cast("long")
                     .alias("hub_micros"),
                    F.coalesce("auth_micros", F.lit(0)).cast("long")
                     .alias("auth_micros")))


def k_core(edges: DataFrame, k: int, src_col: str = "src",
           dst_col: str = "dst", max_iters: int = FIXPOINT_MAX_ITERS,
           return_rounds: bool = False):
    """The k-CORE of the undirected simple view of the edge relation —
    the maximal subgraph in which every node has degree >= k, computed
    by iterative PEELING: drop every node whose current degree is
    below k, recompute degrees over the survivors, repeat to fixpoint.
    The k-core is UNIQUE (the union of all subgraphs with min degree
    >= k), i.e. a pure function of the graph — peel order cannot
    change it — which makes the peeling loop driver-gateable exactly
    (oracle: the same rounds unrolled in SQL). Production use:
    link-farm / spam-cluster cores (organic link neighborhoods shed
    under peeling, near-cliques survive), influencer-core extraction,
    and graph densification before expensive per-node analysis.

    Returns (node, core_degree) for the SURVIVORS ONLY (nodes outside
    the core are absent — membership is the signal), core_degree =
    the node's degree within the core. With ``return_rounds=True``
    returns (core, rounds).

    Convergence certificate: the alive set only ever SHRINKS, so two
    consecutive equal counts — one exact integer per round — prove
    the fixpoint. Loud failure past ``max_iters`` (a path graph peels
    one layer from each end per round, O(n/2) rounds — the documented
    adversary; host graphs peel in a handful).

    Scale shape per round: two semi-joins filtering the (shrinking)
    edge relation to alive endpoints + one node-keyed count — the
    alive relation is node-sized (broadcastable at host-graph scale),
    per-round localCheckpoint keeps lineage flat."""
    s, d = F.col(src_col), F.col(dst_col)
    cn = (edges.select(F.least(s, d).alias("u"),
                       F.greatest(s, d).alias("v"))
          .filter(F.col("u") != F.col("v"))
          .distinct()
          .transform(_ckpt))
    sym = (cn.select(F.col("u").alias("node"), F.col("v").alias("other"))
           .unionByName(cn.select(F.col("v").alias("node"),
                                  F.col("u").alias("other")))
           .transform(_ckpt))
    alive = sym.select("node").distinct().transform(_ckpt)
    n_alive = alive.count()
    for rounds in range(1, max_iters + 1):
        deg = (sym.join(alive, "node", "semi")
               .join(alive.withColumnRenamed("node", "other"),
                     "other", "semi")
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
               .transform(_ckpt))
        nxt = deg.filter(F.col("core_degree") >= k)
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            # fixpoint: deg was computed over this exact alive set, so
            # the surviving rows carry the final core degrees
            core = nxt.select("node", "core_degree")
            return (core, rounds) if return_rounds else core
        # no checkpoint (r17): alive is a narrow filter+project over the
        # round's ALREADY-CHECKPOINTED deg relation — the next round's
        # two semi-joins re-scan that flat leaf cheaply, and lineage
        # stays bounded at depth one because deg re-checkpoints every
        # round. The previous eager checkpoint here was a third job per
        # round buying nothing.
        alive = nxt.select("node")
        n_alive = n_nxt
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def triangle_counts(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Per-node TRIANGLE counts over the undirected simple view of the
    edge relation — the local-density primitive behind clustering
    coefficients and link-farm / spam-cluster detection (organic link
    neighborhoods are sparse; farms are near-cliques, so triangle
    density separates them).

    Exactness: edges canonicalize to (u < v) distinct pairs, triangles
    enumerate as ordered triples a < b < c via two joins
    ((a,b) ⋈ (b,c) ⋈ (a,c)) — each triangle exactly once, a pure
    function of the graph, so the count is driver-gateable against the
    same three-way self-join in SQL. Nodes in no triangle are ABSENT
    (join semantics; the caller left-joins the node relation if zeros
    matter).

    Scale shape: this is the standard distributed triangle enumeration
    — two hash joins on the canonical edge relation, O(E^{3/2}) pair
    work bounded by the join on the lower-degree endpoint ordering
    (the a < b < c constraint is exactly the degree-ordering trick's
    effect on enumeration multiplicity). No iteration, no driver
    state."""
    s, d = F.col(src_col), F.col(dst_col)
    # edge-relation-sized checkpoint: the enumeration scans cn THREE
    # times (e1/e2/e3) — without it each leg re-executes the caller's
    # full upstream lineage (the pagerank lesson; for a crawl-derived
    # graph that is the whole link extraction, three times)
    cn = (edges.select(F.least(s, d).alias("u"),
                       F.greatest(s, d).alias("v"))
          .filter(F.col("u") != F.col("v"))
          .distinct()
          .transform(_ckpt))
    e1 = cn.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = cn.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = cn.select(F.col("u").alias("a"), F.col("v").alias("c"))
    # Size-gated broadcast (r17, guide §3.1): a checkpointed LogicalRDD
    # INHERITS its upstream plan's size estimate — for relations built
    # from regex/explode lineage that estimate is unknown (Long.Max),
    # so the planner ran all three enumeration joins as SortMergeJoins
    # with full exchanges even on a 20-row fixture relation (audit
    # r17). The relation is already materialized, so decide from its
    # TRUE row count AND its true key payload bytes (ADVICE r17: a
    # row-count proxy alone can admit hundreds of MB of long string
    # host keys into two broadcast relations) — one agg job over the
    # checkpointed RDD, same cost as the previous bare count. Under
    # both bounds the two probe joins broadcast the right sides and e1
    # never shuffles; above either the honest SMJ stands (web-scale
    # pair relations exceed any broadcast cap).
    def _key_bytes(c: str):
        dt = dict(cn.dtypes)[c]
        return (F.octet_length(F.col(c)) if dt == "string"
                else F.lit(8))

    n_cn, key_bytes = cn.agg(
        F.count(F.lit(1)),
        F.sum(_key_bytes("u") + _key_bytes("v"))).first()
    # 64 MiB of raw key payload per broadcast side: the built hash
    # relation inflates ~2-4x over raw bytes, keeping the executors'
    # copies well under broadcast-pressure territory
    if n_cn <= 1_000_000 and (key_bytes or 0) <= (64 << 20):
        e2, e3 = F.broadcast(e2), F.broadcast(e3)
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # ONE evaluation of the enumeration tree (r17, guide §2.4): the
    # previous union of three projections re-executed the whole
    # two-join subtree per branch (no exchange reuse across the
    # aliased branches — 3x the join work in one job); exploding the
    # member array emits the identical (a, b, c) multiset in a single
    # pass.
    members = tri.select(F.explode(F.array(
        F.col("a"), F.col("b"), F.col("c"))).alias("node"))
    return (members.groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))


def pagerank_personalized(edges: DataFrame, seeds: DataFrame,
                          iterations: int = 3, damping_pct: int = 85,
                          src_col: str = "src", dst_col: str = "dst",
                          checkpoint_every: int = 1) -> DataFrame:
    """PERSONALIZED PageRank (random surfer restarting at a SEED set
    instead of uniformly — Haveliwala's topic-sensitive form): the
    teleport mass (100 - d)% * MICROS // 100 splits over the seed
    nodes only, and the iteration starts from the uniform-over-seeds
    vector, so rank measures proximity to the seed list under the
    link structure — the crawl-budget prior for topic- or
    site-focused crawling (hosts near the seeds rank high even when
    globally obscure; spam farms far from the seeds get nothing).

    Same exactness discipline as pagerank_fixed (which this mirrors
    rather than parameterizes — the uniform path stays bit-frozen for
    its gated rows): integer-micros arithmetic throughout, true `div`
    floor divisions, fixed iteration count, so the result is exactly
    SQL-mirrorable. Nodes unreachable from the seeds hold rank 0 and
    REMAIN in the output (the caller reads zero as "outside the
    neighborhood", the useful signal).

    Caller contract: ``seeds``' first column holds node ids; the node
    universe is the edge endpoints UNION the seed set, so a seed
    absent from the edge relation still gets its row — it holds its
    teleport share but receives no inbound flow and (having no
    out-edges) contributes none, exactly the isolated-node semantics.
    (ADVICE r13: the previous left-join built the universe from edge
    endpoints only, silently dropping off-graph seeds while still
    counting them in k — the teleport mass summed below (100-d)% of
    MICROS.) The per-seed share (100-d)% * MICROS // 100 // n_seeds
    must be >= 1 micro, i.e. n_seeds <= ~150k at the default damping
    — any larger personal set needs a bigger mass unit, and the
    function fails loud.

    Scale shape: identical to pagerank_fixed — K stages of edge-join
    + node-keyed sum with a broadcastable node-sized rank relation;
    the seed relation is one extra node-sized left join folded into
    the checkpointed teleport base."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = (edges.select(src.alias("src"), dst.alias("dst")).distinct()
         .transform(_ckpt))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    sd = (seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
          .transform(_ckpt))
    nodes = nodes.unionByName(sd).distinct()
    k = sd.count()
    tnum = (100 - damping_pct) * MICROS // 100
    if k == 0 or tnum // k == 0:
        raise ValueError(
            f"pagerank_personalized: {k} seeds cannot each carry a "
            f">= 1 micro teleport share of {tnum} — shrink the seed "
            f"set or raise the mass unit")
    base = (nodes.join(sd.withColumn("__s", F.lit(1)), "node", "left")
            .select("node",
                    F.when(F.col("__s") == 1, F.lit(tnum // k))
                     .otherwise(F.lit(0)).cast("long").alias("tele"))
            .transform(_ckpt))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = base.select(
        "node", F.when(F.col("tele") > 0, F.lit(MICROS // k))
                 .otherwise(F.lit(0)).cast("long").alias("r"))
    for i in range(iterations):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("node"),
                            F.expr("r div od").alias("c")))
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (base.join(s, "node", "left")
                 .select("node",
                         (F.col("tele")
                          + F.expr(f"({damping_pct} * coalesce(s, "
                                   f"CAST(0 AS BIGINT))) div 100"))
                         .cast("long").alias("r")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks.select(F.col("node"),
                        F.col("r").alias("rank_micros"),
                        (F.col("r") / F.lit(float(MICROS)))
                        .cast("double").alias("rank"))


def pagerank_fixed(edges: DataFrame, iterations: int = 3,
                   damping_pct: int = 85,
                   src_col: str = "src", dst_col: str = "dst",
                   checkpoint_every: int = 1,
                   init_ranks: DataFrame | None = None) -> DataFrame:
    """PageRank over a DISTINCT edge relation, ``iterations`` exact
    integer-micros steps of

        r'(u) = (100 - d)% * MICROS / N  +  d% * sum_{v->u} r(v) // out(v)

    (all divisions floor; see module docstring for why). Returns
    (node, rank_micros, rank) — rank = micros / 1e6 as double, one
    exact divide. Nodes = union of both edge endpoints; a node with no
    inbound links holds the teleport mass only.

    ``init_ranks`` (node, rank_micros) WARM-STARTS the iteration from a
    persisted rank table instead of the uniform vector — the
    incremental form: because each step is a pure function of the
    previous vector and the arithmetic is exact, K stored + K' warm
    iterations equal K+K' from scratch BIT-FOR-BIT (the gated
    web_pagerank_warm_start contract), so a standing rank table can be
    advanced delivery by delivery without recomputing history. The
    caller guarantees init covers the node set (ranks for vanished
    nodes are dropped; nodes missing from init would iterate from
    NULL — they are seeded with the uniform share instead)."""
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct()
    # Materialize the DISTINCT edge relation ONCE: e is referenced by
    # every iteration (contrib join + outdeg) plus nodes, and without a
    # checkpoint each reference re-executes the caller's full upstream
    # lineage — for a crawl-derived graph that is the whole link
    # extraction over the corpus, K x 2 times (measured 38.6 s for
    # K=10 at sf10 vs 3.5 s checkpointed). The checkpoint is
    # edge-relation sized — host-graph scale, KBs-to-GBs at web scale,
    # never corpus-sized.
    e = e.transform(_ckpt)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    # two scalars of driver state: node count and the teleport term —
    # graph-metadata sized, not data sized
    n = nodes.count()
    teleport = ((100 - damping_pct) * MICROS // 100) // n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    if init_ranks is not None:
        ranks = (nodes.join(
            init_ranks.select(F.col("node"),
                              F.col("rank_micros").alias("__init")),
            "node", "left")
            .select("node",
                    F.coalesce("__init", F.lit(MICROS // n))
                     .cast("long").alias("r")))
    else:
        ranks = nodes.select("node",
                             F.lit(MICROS // n).cast("long").alias("r"))
    for i in range(iterations):
        # TRUE integer division (`div`), not floor(double): floor(r/od)
        # agrees with r // od only while r is small enough that the
        # double rounding error stays under 1/od — guaranteed at micros
        # scale but NOT for arbitrary caller-supplied init_ranks. `div`
        # keeps the bit-for-bit warm-start contract over the full long
        # domain (regression: tests/test_graph.py).
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("node"),
                            F.expr("r div od").alias("c")))
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(s, "node", "left")
                 .select("node",
                         F.expr(f"CAST({teleport} AS BIGINT) + "
                                f"(({damping_pct} * coalesce(s, "
                                f"CAST(0 AS BIGINT))) div 100)")
                         .cast("long").alias("r")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks.select(F.col("node"),
                        F.col("r").alias("rank_micros"),
                        (F.col("r") / F.lit(float(MICROS)))
                        .cast("double").alias("rank"))


def _collapse_weighted_edges(edges: DataFrame, src_col: str,
                             dst_col: str, weight_col: str,
                             fn_name: str) -> DataFrame:
    """Multigraph collapse with the in-plan raw-weight guard, shared
    by both weighted rank forms: parallel (src,dst) rows SUM their
    weights, and the fail-loud guard runs on the RAW per-row weights,
    BEFORE the collapse — post-aggregation totals would let a NULL
    (skipped by SUM) or a negative row that nets positive with a
    parallel edge pass silently, exactly the corruption the guard's
    message promises to catch. It rides IN the collapse aggregation
    (the dsum(checked=True) assert_true pattern) rather than as a
    separate eager count: the caller's upstream edge lineage — the
    whole corpus-sized link extraction for a crawl graph — executes
    exactly ONCE, in the caller's eager checkpoint, which is also the
    job that evaluates the guard for every group (ADVICE r16; the
    job-count parity with pagerank_fixed is regression-pinned)."""
    src, dst = F.col(src_col), F.col(dst_col)
    w = F.col(weight_col)
    agg = (edges.groupBy(src.alias("src"), dst.alias("dst"))
           .agg(F.sum(w).cast("long").alias("__w"),
                F.sum(F.when(w.isNull() | (w < 1), 1).otherwise(0))
                 .alias("__bad")))
    guard = F.assert_true(
        F.col("__bad") == 0,
        F.concat(
            F.lit(f"{fn_name}: "),
            F.col("__bad").cast("string"),
            F.lit(" raw edge row(s) with NULL or non-positive weight"
                  " on one (src,dst) pair — weights must be positive"
                  " integers (a zero/NULL-weight row silently alters"
                  " every sibling edge's share); filter or fix"
                  " upstream")))
    # when() forces the guard before w is served; guard is NULL on pass
    return agg.select("src", "dst",
                      F.when(guard.isNull(), F.col("__w")).alias("w"))


def pagerank_weighted(edges: DataFrame, iterations: int = 3,
                      damping_pct: int = 85,
                      src_col: str = "src", dst_col: str = "dst",
                      weight_col: str = "weight",
                      checkpoint_every: int = 1,
                      init_ranks: DataFrame | None = None) -> DataFrame:
    """PageRank over a WEIGHTED edge relation — ``iterations`` exact
    integer-micros steps of

        r'(u) = (100-d)% * MICROS / N
                + d% * sum_{v->u} w(v,u) * (r(v) div W(v))

    where W(v) is v's total outbound weight: each UNIT of weight
    carries one floor-divided share ``r div W``, so a (v,u) edge of
    weight w contributes exactly w shares — link multiplicity (the
    per-host-pair ``n_urls`` evidence a crawl's link extraction
    already aggregates) feeds rank instead of being flattened to 0/1.
    This is the form real crawl priors use: ten distinct URLs linking
    a host is stronger evidence than one.

    Mirrors rather than parameterizes ``pagerank_fixed`` (the
    unweighted path stays bit-frozen for its gated rows — the
    pagerank_personalized precedent). Degenerate identity, pinned by
    test: all weights 1 makes W(v) the out-degree and w * (r div W)
    = r div od, so the result equals pagerank_fixed BIT-FOR-BIT.

    Exactness: integer-micros, true `div` floors, BIGINT sums — same
    driver-gateable class as the whole module. Mass note: each edge
    truncates < w micros total (one micro per weight unit); ranking
    unaffected. Overflow bound: sum_{v->u} w * (r div W) <= sum r <=
    MICROS * N shares before damping — same bound as pagerank_fixed.

    Parallel (src,dst) rows SUM their weights (the multigraph
    collapse); weights must be positive integers — a zero/negative/
    NULL weight is upstream corruption and fails loud (a w=0 edge
    would silently alter W(v) for every sibling edge).

    ``init_ranks`` warm-starts exactly as in pagerank_fixed: K stored
    + K' warm = K+K' from scratch bit-for-bit, because every step is
    a pure exact function of the previous vector."""
    e = _collapse_weighted_edges(edges, src_col, dst_col, weight_col,
                                 "pagerank_weighted")
    # edge-relation-sized checkpoint: referenced by every iteration
    # plus nodes/outw (the pagerank_fixed lesson); materializing every
    # group row here is what fires the guard at call time
    e = e.transform(_ckpt)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    teleport = ((100 - damping_pct) * MICROS // 100) // n
    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    if init_ranks is not None:
        ranks = (nodes.join(
            init_ranks.select(F.col("node"),
                              F.col("rank_micros").alias("__init")),
            "node", "left")
            .select("node",
                    F.coalesce("__init", F.lit(MICROS // n))
                     .cast("long").alias("r")))
    else:
        ranks = nodes.select("node",
                             F.lit(MICROS // n).cast("long").alias("r"))
    for i in range(iterations):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                    .join(outw, "src")
                    .select(F.col("dst").alias("node"),
                            F.expr("w * (r div tw)").alias("c")))
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(s, "node", "left")
                 .select("node",
                         F.expr(f"CAST({teleport} AS BIGINT) + "
                                f"(({damping_pct} * coalesce(s, "
                                f"CAST(0 AS BIGINT))) div 100)")
                         .cast("long").alias("r")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks.select(F.col("node"),
                        F.col("r").alias("rank_micros"),
                        (F.col("r") / F.lit(float(MICROS)))
                        .cast("double").alias("rank"))


def pagerank_weighted_personalized(edges: DataFrame, seeds: DataFrame,
                                   iterations: int = 3,
                                   damping_pct: int = 85,
                                   src_col: str = "src",
                                   dst_col: str = "dst",
                                   weight_col: str = "weight",
                                   checkpoint_every: int = 1) -> DataFrame:
    """WEIGHTED PERSONALIZED PageRank — the composition of the two
    gated forms (pagerank_personalized's seed-restart teleport,
    pagerank_weighted's link-multiplicity shares): the random surfer
    restarts at the SEED LIST and each (v,u) edge of weight w carries
    exactly w floor-divided shares ``r(v) div W(v)`` — the actual
    topic-focused crawl-budget prior, where rank measures
    multiplicity-weighted link proximity to the seeds.

    Mirrors rather than parameterizes its two parents (their gated
    rows stay bit-frozen — the module's precedent). Degenerate
    identities, both pinned bit-for-bit in tests/test_graph.py:
    all weights 1 == pagerank_personalized (W(v) becomes out-degree);
    seeds == all nodes == pagerank_weighted (per-seed teleport and
    init collapse to the uniform shares).

    Exactness: integer-micros, true `div` floors, BIGINT sums — the
    module's driver-gateable class. Caller contract on seeds is
    pagerank_personalized's (first column = node ids, universe =
    endpoints UNION seeds, per-seed share must be >= 1 micro, fails
    loud otherwise). Weights must be positive integers; the raw-row
    guard rides the multigraph-collapse aggregation (the r16
    pagerank_weighted pattern — zero extra jobs).

    Scale shape: identical to pagerank_weighted — K stages of
    host-pair-sized edge join + node-keyed sum over a checkpointed
    collapsed relation; the seed relation is one node-sized left join
    folded into the checkpointed teleport base."""
    e = (_collapse_weighted_edges(edges, src_col, dst_col, weight_col,
                                  "pagerank_weighted_personalized")
         .transform(_ckpt))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    sd = (seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
          .transform(_ckpt))
    nodes = nodes.unionByName(sd).distinct()
    k = sd.count()
    tnum = (100 - damping_pct) * MICROS // 100
    if k == 0 or tnum // k == 0:
        raise ValueError(
            f"pagerank_weighted_personalized: {k} seeds cannot each "
            f"carry a >= 1 micro teleport share of {tnum} — shrink "
            f"the seed set or raise the mass unit")
    base = (nodes.join(sd.withColumn("__s", F.lit(1)), "node", "left")
            .select("node",
                    F.when(F.col("__s") == 1, F.lit(tnum // k))
                     .otherwise(F.lit(0)).cast("long").alias("tele"))
            .transform(_ckpt))
    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    ranks = base.select(
        "node", F.when(F.col("tele") > 0, F.lit(MICROS // k))
                 .otherwise(F.lit(0)).cast("long").alias("r"))
    for i in range(iterations):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                    .join(outw, "src")
                    .select(F.col("dst").alias("node"),
                            F.expr("w * (r div tw)").alias("c")))
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (base.join(s, "node", "left")
                 .select("node",
                         (F.col("tele")
                          + F.expr(f"({damping_pct} * coalesce(s, "
                                   f"CAST(0 AS BIGINT))) div 100"))
                         .cast("long").alias("r")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks.select(F.col("node"),
                        F.col("r").alias("rank_micros"),
                        (F.col("r") / F.lit(float(MICROS)))
                        .cast("double").alias("rank"))
