"""DuckDB oracle SQL for the full linking pipeline, assembled from the
same *_sql templates the Spark operators are built from. One CTE per
pipeline stage so every intermediate can be checked independently."""

from __future__ import annotations

from ..operators import blocking as B
from ..operators import dictionary as DICT
from ..operators import pairs as P
from ..operators import scoring as S
from ..operators.clustering import clusters_sql
from ..plans.pipeline import LinkingConfig
from ..sources.transcripts import derive_transcripts_sql


def blocks_union_sql(
    records_rel: str, cfg: LinkingConfig, dict_rel: str | None = None
) -> str:
    """UNION ALL of the enabled block families over `records_rel` — the
    SQL twin of plans.pipeline.build_blocks. `dict_rel` names the alias
    dictionary relation (required when cfg.use_dict)."""
    parts = []
    if cfg.use_first_token:
        parts.append(B.first_token_blocks_sql(records_rel))
    if cfg.use_tokens:
        parts.append(B.token_blocks_sql(records_rel))
    if cfg.use_lsh:
        sig = B.minhash_signatures_sql(
            records_rel, cfg.n_perm, cfg.shingle, cfg.seed
        )
        parts.append(B.lsh_blocks_sql(sig, cfg.n_perm, cfg.band_rows))
    if cfg.use_dict:
        parts.append(DICT.dict_blocks_sql(records_rel, dict_rel))
    if cfg.use_fuzzy_dict:
        parts.append(DICT.fuzzy_dict_blocks_sql(records_rel))
    return " UNION ALL ".join(f"({p})" for p in parts)


def pipeline_ctes(cfg: LinkingConfig | None = None, documents_rel: str = "documents") -> str:
    """WITH-clause body defining: transcripts, records, blocks, pairs,
    features, edges (cluster query composed separately — needs RECURSIVE)."""
    cfg = cfg or LinkingConfig()
    tsql = derive_transcripts_sql(documents_rel)
    records = B.prepare_records_sql("SELECT * FROM transcripts")
    adict = DICT.alias_dictionary_sql("SELECT * FROM records")
    blocks = blocks_union_sql(
        "SELECT * FROM records", cfg, "SELECT * FROM alias_dict"
    )
    prs = P.block_pairs_sql("SELECT * FROM blocks", cfg.block_cap)
    feats = S.pair_features_sql("SELECT * FROM pairs", "SELECT * FROM records")
    edges = S.match_edges_sql("SELECT * FROM features")
    return f"""
    transcripts AS ({tsql}),
    records AS ({records}),
    alias_dict AS ({adict}),
    blocks AS ({blocks}),
    pairs AS ({prs}),
    features AS ({feats}),
    edges AS ({edges})
    """


def stage_sql(stage_select: str, cfg: LinkingConfig | None = None) -> str:
    return f"WITH {pipeline_ctes(cfg)} {stage_select}"


def clusters_oracle_sql(cfg: LinkingConfig | None = None) -> str:
    """Full pipeline through transitive clustering (recursive CTE)."""
    inner = clusters_sql("SELECT * FROM records", "SELECT * FROM edges")
    # the recursive closure lives in its own derived-table scope; the
    # pipeline CTEs stay visible inside it
    return f"WITH {pipeline_ctes(cfg)} SELECT * FROM ({inner})"


def incremental_oracle_sql(
    cfg: LinkingConfig | None = None, documents_rel: str = "documents"
) -> str:
    """DuckDB replay of the INCREMENTAL computation (operators/
    incremental.py): split conversations by parity, cluster the even half
    stand-alone, then fold the odd half in via (new,new)+(new,old) pairs
    unioned with the old clustering's star edges. This value-checks every
    stage of the incremental operator itself; the incremental == full-batch
    *equivalence* is a separate property proven in pytest on fixtures
    where no block crosses the cap boundary between the half and full
    corpus (crossing it legitimately changes which pairs the cap admits)."""
    cfg = cfg or LinkingConfig()
    tsql = derive_transcripts_sql(documents_rel)
    parity = "CAST(substr(conv_id, 6) AS INT) % 2"
    old_blocks = blocks_union_sql("SELECT * FROM old_records", cfg)
    new_blocks = blocks_union_sql("SELECT * FROM new_records", cfg)
    feats = S.pair_features_sql(
        "SELECT a_key, b_key FROM inc_pairs", "SELECT * FROM all_records"
    )
    old_feats = S.pair_features_sql(
        "SELECT * FROM old_pairs", "SELECT * FROM old_records"
    )
    inner_old = clusters_sql("SELECT * FROM old_records", "SELECT * FROM old_edges")
    inner_all = clusters_sql("SELECT * FROM all_records", "SELECT * FROM inc_edges")
    return f"""
    WITH transcripts AS ({tsql}),
    old_records AS ({B.prepare_records_sql(f"SELECT * FROM transcripts WHERE {parity} = 0")}),
    new_records AS ({B.prepare_records_sql(f"SELECT * FROM transcripts WHERE {parity} = 1")}),
    all_records AS (SELECT * FROM old_records UNION ALL SELECT * FROM new_records),
    old_blocks AS ({old_blocks}),
    new_blocks AS ({new_blocks}),
    old_pairs AS ({P.block_pairs_sql("SELECT * FROM old_blocks", cfg.block_cap)}),
    old_features AS ({old_feats}),
    old_edges AS ({S.match_edges_sql("SELECT * FROM old_features")}),
    old_clusters AS MATERIALIZED ({inner_old}),
    tagged AS (
      SELECT rec_key, block_key, FALSE AS is_new FROM old_blocks
      UNION ALL
      SELECT rec_key, block_key, TRUE AS is_new FROM new_blocks
    ),
    capped AS (
      SELECT t.rec_key, t.block_key, t.is_new
      FROM tagged t
      JOIN (
        SELECT block_key FROM tagged
        GROUP BY block_key HAVING count(*) <= {cfg.block_cap}
      ) ok USING (block_key)
    ),
    inc_pairs AS (
      -- probe side new-only, build side all: old×old never enumerated
      -- (mirrors operators/incremental.incremental_pairs)
      SELECT DISTINCT least(a.rec_key, b.rec_key) AS a_key,
                      greatest(a.rec_key, b.rec_key) AS b_key
      FROM (SELECT rec_key, block_key FROM capped WHERE is_new) a
      JOIN capped b USING (block_key)
      WHERE a.rec_key <> b.rec_key
    ),
    inc_features AS ({feats}),
    new_edges AS ({S.match_edges_sql("SELECT * FROM inc_features")}),
    inc_edges AS (
      SELECT * FROM new_edges
      UNION ALL
      SELECT rec_key AS a_key, cluster_id AS b_key FROM old_clusters
      WHERE rec_key <> cluster_id
    )
    SELECT * FROM ({inner_all})
    """
