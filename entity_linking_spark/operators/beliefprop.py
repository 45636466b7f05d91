"""Loopy belief propagation (max-product) as iterative DataFrame ops.

Reference parity — the reference's collective-disambiguation core, which
the north_star *replaces* on the critical path with the calibrated
logistic scorer + connected components, re-expressed relationally so the
capability itself is still available to a migrating user:

  * G1 driver loop: `loopybeliefpropagation/LoopyBeliefPropagation.java:37-124`
    — iterate ≤ `max_iter` (75 in eval, `evaluation/
    VerifyEntityDisambiguationLoopy.java:23`); per ordered mention pair
    (from → to) and target candidate, the outgoing message is the MAX over
    source candidates of [local ψ + pairwise ψ + Σ incoming messages
    excluding the reverse edge]; messages are normalized by subtracting
    the per-(edge) minimum over target candidates
    (`LoopyBeliefPropagation.java:79-100`); convergence when the largest
    per-candidate belief delta < EPS (`:104-109,126-137`).
  * G2 scorer shape: ψ decomposes into a per-(mention,candidate) local
    term and a per-(candidate,candidate) pairwise term — the ScorerBasic
    decomposition (`loopybeliefpropagation/ScorerBasic.java:32-44`); any
    weighting of priors/relatedness can be folded into those two columns
    upstream, which is how ScorerFull/ScorerMaxEnt differ from Basic.
  * G3 sum-minus-self: Σ over all in-messages to (mention, candidate)
    minus the one from the excluded neighbor, computed from ONE inbox
    aggregate per round (`loopybeliefpropagation/MessagesMap.java:28-46`
    memoizes the same total) — no per-edge re-aggregation.
  * W3 solution: argmax candidate per mention over final beliefs
    (`ScorerBasic.java:64-86`).

Spark shape per round: one `groupBy(mention, cand)` inbox aggregate +
one join back to the directed edge set + one max-group — two shuffles,
`localCheckpoint` per round (the same lineage discipline as connected
components and PageRank). State lives in DataFrames keyed
(src, dst, cand): at 10^12 turns the graph is per-conversation-block
partitioned and rounds shuffle on bounded keys; the candidate-fanout
guard (F4) bounds the message table to |edges|·|cands|.

Inputs:
  candidates: (mention, cand, local)       — ψ_local, one row per option
  potentials: (c_a, c_b, psi)              — symmetric pairwise ψ
  edges:      (m_a, m_b)                   — mention graph (undirected)

BigDecimal note: the reference accumulates messages in BigDecimal for
numeric stability (`md/MentionDetection.java:264-280`); doubles with
min-subtraction normalization are stable for the magnitudes here
(SURVEY §1.2), and the pytest oracle reproduces the same doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_ITER = 75  # VerifyEntityDisambiguationLoopy.java:23
EPS = 1e-5  # LoopyBeliefPropagation.java:22


def _directed_edges(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("m_a").alias("src"), F.col("m_b").alias("dst")
    ).union(edges.select(F.col("m_b").alias("src"), F.col("m_a").alias("dst")))


def loopy_bp(
    candidates: DataFrame,
    potentials: DataFrame,
    edges: DataFrame,
    max_iter: int = 10,
    eps: float | None = EPS,
    checkpoint: bool = True,
    info: dict | None = None,
) -> DataFrame:
    """(mention, cand, belief): max-product beliefs after convergence.

    belief(m, c) = local(m, c) + Σ_in msg(·→m, c); messages start at 0
    (`LoopyBeliefPropagation.java:139-153` init) and update as described
    in the module docstring. Convergence: max |Δbelief| < eps; pass
    eps=None to run exactly `max_iter` synchronous rounds (the mode the
    fixed-round DuckDB oracle replays).

    Schedule note: updates are synchronous (Jacobi) — all round-k
    messages computed from round-(k-1) state — the parallelizable
    variant; the reference's in-place loop
    (`LoopyBeliefPropagation.java:47-102`) is a sequential Gauss-Seidel
    schedule that is inherently single-threaded. Fixed points coincide;
    the pytest oracle replays the synchronous schedule exactly.

    `info`, if given, is populated with {"iterations": rounds run,
    "delta": last max |Δbelief| (None when eps is None)} — the
    convergence telemetry the reference prints per iteration
    (`LoopyBeliefPropagation.java:104-109`).
    """
    de = _directed_edges(edges)
    if checkpoint:
        de = de.localCheckpoint()
    # ψ table per directed edge: (src, dst, c_src, c_dst, psi) — src's
    # candidate against dst's candidate (potentials symmetric)
    ca = candidates.select(
        F.col("mention").alias("src"), F.col("cand").alias("c_src"),
        F.col("local").alias("local_src"),
    )
    cb = candidates.select(
        F.col("mention").alias("dst"), F.col("cand").alias("c_dst")
    )
    psi_ab = potentials.select(
        F.col("c_a").alias("c_src"), F.col("c_b").alias("c_dst"), "psi"
    ).union(
        potentials.select(
            F.col("c_b").alias("c_src"), F.col("c_a").alias("c_dst"), "psi"
        )
    ).distinct()
    edge_psi = (
        de.join(ca, "src")
        .join(cb, "dst")
        .join(psi_ab, ["c_src", "c_dst"], "left")
        .select(
            "src", "dst", "c_src", "c_dst", "local_src",
            F.coalesce("psi", F.lit(0.0)).alias("psi"),
        )
    )
    if checkpoint:
        edge_psi = edge_psi.localCheckpoint()

    # messages (src, dst, cand=c_dst, msg); init 0
    msgs = de.join(cb, "dst").select(
        "src", "dst", F.col("c_dst").alias("cand"), F.lit(0.0).alias("msg")
    )
    if checkpoint:
        msgs = msgs.localCheckpoint()
    prev_belief = None
    last_delta = None
    n_rounds = 0
    for _ in range(max_iter):
        n_rounds += 1
        # G3: inbox(m, c) = Σ msg(·→m, c), ONE aggregate; the excluded
        # reverse message is subtracted per edge, not re-aggregated
        inbox = msgs.groupBy(
            F.col("dst").alias("m"), "cand"
        ).agg(F.sum("msg").alias("inbox"))
        rev = msgs.select(
            F.col("dst").alias("src"),  # reverse edge: dst→src carries
            F.col("src").alias("dst"),  # the message to exclude at src
            F.col("cand").alias("c_src"),
            F.col("msg").alias("rev_msg"),
        )
        scored = (
            edge_psi.join(
                inbox.select(
                    F.col("m").alias("src"), F.col("cand").alias("c_src"),
                    "inbox",
                ),
                ["src", "c_src"],
                "left",
            )
            .join(rev, ["src", "dst", "c_src"], "left")
            .select(
                "src", "dst", "c_dst",
                (
                    F.col("local_src")
                    + F.col("psi")
                    + F.coalesce("inbox", F.lit(0.0))
                    - F.coalesce("rev_msg", F.lit(0.0))
                ).alias("val"),
            )
        )
        raw = scored.groupBy("src", "dst", F.col("c_dst").alias("cand")).agg(
            F.max("val").alias("msg")
        )
        # normalization: subtract per-(edge) min over target candidates
        # (LoopyBeliefPropagation.java:79-100)
        wedge = Window.partitionBy("src", "dst")
        msgs = raw.select(
            "src", "dst", "cand",
            (F.col("msg") - F.min("msg").over(wedge)).alias("msg"),
        )
        if checkpoint:
            msgs = msgs.localCheckpoint()
        belief = (
            candidates.join(
                msgs.groupBy(F.col("dst").alias("mention"), "cand").agg(
                    F.sum("msg").alias("inbox")
                ),
                ["mention", "cand"],
                "left",
            )
            .select(
                "mention", "cand",
                (F.col("local") + F.coalesce("inbox", F.lit(0.0))).alias("belief"),
            )
        )
        if checkpoint:
            belief = belief.localCheckpoint()
        if eps is not None and prev_belief is not None:
            delta = (
                belief.alias("n")
                .join(prev_belief.alias("p"), ["mention", "cand"])
                .agg(
                    F.max(F.abs(F.col("n.belief") - F.col("p.belief"))).alias("d")
                )
                .collect()[0]["d"]
            )
            last_delta = delta
            if delta is not None and delta < eps:
                prev_belief = belief
                break
        prev_belief = belief
    if info is not None:
        info["iterations"] = n_rounds
        info["delta"] = last_delta
    return prev_belief


def bp_solution(beliefs: DataFrame) -> DataFrame:
    """W3: argmax candidate per mention, deterministic tie-break
    (belief desc, cand asc) — `ScorerBasic.java:64-86`."""
    w = Window.partitionBy("mention").orderBy(F.desc("belief"), F.asc("cand"))
    return (
        beliefs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("mention", "cand", F.round("belief", 6).alias("belief"))
    )


def loopy_bp_ctes(
    candidates_rel: str,
    potentials_rel: str,
    edges_rel: str,
    iters: int = 2,
) -> tuple[str, str]:
    """(cte_body, final_select) DuckDB twin of
    `loopy_bp(..., max_iter=iters, eps=None)` — the synchronous message
    rounds unrolled as CTEs (same pattern as the PageRank oracle), so
    callers can splice them after their own WITH clause.
    candidates_rel: (mention, cand, local);
    potentials_rel: (c_a, c_b, psi); edges_rel: (m_a, m_b)."""
    ctes = [
        f"""bp_de AS MATERIALIZED (
          SELECT m_a AS src, m_b AS dst FROM ({edges_rel})
          UNION ALL
          SELECT m_b AS src, m_a AS dst FROM ({edges_rel})
        )""",
        f"bp_cands AS MATERIALIZED (SELECT mention, cand, local FROM ({candidates_rel}))",
        f"""bp_psi AS MATERIALIZED (
          SELECT DISTINCT c_src, c_dst, psi FROM (
            SELECT c_a AS c_src, c_b AS c_dst, psi FROM ({potentials_rel})
            UNION ALL
            SELECT c_b AS c_src, c_a AS c_dst, psi FROM ({potentials_rel})
          )
        )""",
        """bp_edge_psi AS MATERIALIZED (
          SELECT de.src, de.dst, ca.cand AS c_src, cb.cand AS c_dst,
                 ca.local AS local_src, coalesce(p.psi, 0.0) AS psi
          FROM bp_de de
          JOIN bp_cands ca ON ca.mention = de.src
          JOIN bp_cands cb ON cb.mention = de.dst
          LEFT JOIN bp_psi p ON p.c_src = ca.cand AND p.c_dst = cb.cand
        )""",
        """bp_m0 AS (
          SELECT de.src, de.dst, cb.cand, 0.0 AS msg
          FROM bp_de de JOIN bp_cands cb ON cb.mention = de.dst
        )""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""bp_raw{k} AS MATERIALIZED (
              SELECT e.src, e.dst, e.c_dst AS cand,
                     max(e.local_src + e.psi + coalesce(i.inbox, 0.0)
                         - coalesce(r.msg, 0.0)) AS msg
              FROM bp_edge_psi e
              LEFT JOIN (
                SELECT dst AS m, cand, sum(msg) AS inbox
                FROM bp_m{k - 1} GROUP BY dst, cand
              ) i ON i.m = e.src AND i.cand = e.c_src
              LEFT JOIN bp_m{k - 1} r
                ON r.src = e.dst AND r.dst = e.src AND r.cand = e.c_src
              GROUP BY e.src, e.dst, e.c_dst
            )"""
        )
        ctes.append(
            f"""bp_m{k} AS MATERIALIZED (
              SELECT src, dst, cand,
                     msg - min(msg) OVER (PARTITION BY src, dst) AS msg
              FROM bp_raw{k}
            )"""
        )
    body = ",\n".join(ctes)
    final = f"""
    SELECT c.mention, c.cand,
           round(c.local + coalesce(i.inbox, 0.0), 6) AS belief
    FROM bp_cands c
    LEFT JOIN (
      SELECT dst AS mention, cand, sum(msg) AS inbox
      FROM bp_m{iters} GROUP BY dst, cand
    ) i ON i.mention = c.mention AND i.cand = c.cand
    """
    return body, final


def loopy_bp_sql(
    candidates_rel: str,
    potentials_rel: str,
    edges_rel: str,
    iters: int = 2,
) -> str:
    body, final = loopy_bp_ctes(candidates_rel, potentials_rel, edges_rel, iters)
    return f"WITH {body} {final}"
