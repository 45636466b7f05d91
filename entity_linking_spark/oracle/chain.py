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


def pipeline_ctes(cfg: LinkingConfig | None = None, documents_rel: str = "documents") -> str:
    """WITH-clause body defining: transcripts, records, blocks, pairs,
    features, edges (cluster query composed separately — needs RECURSIVE)."""
    cfg = cfg or LinkingConfig()
    tsql = derive_transcripts_sql(documents_rel)
    records = B.prepare_records_sql("SELECT * FROM transcripts")
    adict = DICT.alias_dictionary_sql("SELECT * FROM records")
    parts = []
    if cfg.use_first_token:
        parts.append(B.first_token_blocks_sql("SELECT * FROM records"))
    if cfg.use_tokens:
        parts.append(B.token_blocks_sql("SELECT * FROM records"))
    if cfg.use_lsh:
        sig = B.minhash_signatures_sql(
            "SELECT * FROM records", cfg.n_perm, cfg.shingle, cfg.seed
        )
        parts.append(B.lsh_blocks_sql(sig, cfg.n_perm, cfg.band_rows))
    if cfg.use_dict:
        parts.append(
            DICT.dict_blocks_sql("SELECT * FROM records", "SELECT * FROM alias_dict")
        )
    if cfg.use_fuzzy_dict:
        parts.append(DICT.fuzzy_dict_blocks_sql("SELECT * FROM records"))
    blocks = " UNION ALL ".join(f"({p})" for p in parts)
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
