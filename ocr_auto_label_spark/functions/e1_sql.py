"""DuckDB oracle for the complete E1 pipeline (plans/full_pipeline.py).

Composes the flagship twin (functions/flagship_sql.py) with SQL twins of
the remaining E1 stages so the driver can hash the REAL composed Spark
pipeline (Arrow extraction → status decision → per-conv sequential-
transitive grouping via applyInPandas → webapp ordinal naming →
duplicate resolution) against one DuckDB query:

- best-labels = the twin filtered to rank 1 (or the null-candidate row),
  re-joined to the source for ``ts``;
- the sequential fold generalizes the ``auto_group_transitive`` oracle to
  SCORED edges: acceptance needs score(target, source) > 0.35 where
  score = desc-tier(duplicate-counting word overlap, exact int ratios)
  + time decay (colors are empty in E1 → the color part is 0.0), and the
  single ts-ascending pass still means click sources must be earlier in
  (ts, id) order — so the grouped set is again a least fixed point of a
  forward-in-time reachability operator, now over score-filtered edges,
  and the pick is argmax score (strict-> tie → candidate iteration
  order).  Float op trees mirror labelcore.similarity bit-for-bit
  (tier + color(0.0), + decay·0.2, min(·, 1.0)).
- The expensive prefix CTEs are ``MATERIALIZED``: DuckDB inlines
  single-reference CTEs, and the downstream stages reference ``st``
  /``edges`` several times — without materialization every reference
  re-executes the whole twin (measured 166 s → ~11 s with it).
- Stage-3/4 naming is intentionally absent: ``run_full_pipeline`` drops
  the pre-grouping names and recomputes them over the merged state, so
  only the FINAL naming + duplicate sweep reach the output.

Reference semantics: upload.ts:711-741 (flow), 881-902 (decision),
524-537 (sanitize), 679-708 (webapp ordinal), 747-825 (dup resolution),
grouping.ts:28-206 (fold).
"""

from __future__ import annotations


def _sanitize(col: str) -> str:
    s = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"trim({col}), '\\s+', '_', 'g'), '[<>:\"/\\\\|?*]', '', 'g'), "
        "'_+', '_', 'g'), '^_+|_+$', '', 'g')"
    )
    return f"(CASE WHEN {s} = '' THEN 'untitled' ELSE {s} END)"


_EXT = r"regexp_extract(original_name, '[^/]*?[^/.](\.[^./]*)$', 1)"


def full_pipeline_e1_duck_sql(twin_sql: str, src_parquet: str) -> str:
    """The oracle query.  ``twin_sql`` = flagship_twin_sql('duck', ...)
    over the same pinned corpus; ``src_parquet`` = its read_parquet
    expression (for the ts re-join)."""
    decay = "(1.0 - (CAST(p.dt AS DOUBLE) / 120000))"
    sim = (
        "len(list_filter(wt.w, x -> list_contains(wc.w, x))) * 1.0 "
        "/ greatest(len(wt.w), len(wc.w))"
    )
    # labelcore.similarity: base = (tier if both descs non-empty else 0.0)
    # + color_part(0.0); score = base + (decay if > 0 else 0) * 0.2
    tier = (
        f"CASE WHEN NOT (wt.has_d AND wc.has_d) THEN 0.0 "
        f"WHEN {sim} >= 0.8 THEN 0.8 WHEN {sim} >= 0.6 THEN 0.6 "
        f"WHEN {sim} >= 0.4 THEN 0.3 ELSE 0.0 END"
    )
    return f"""
WITH RECURSIVE tw AS MATERIALIZED ({twin_sql}),
srcts AS (SELECT conv_id, turn_idx, ts FROM {src_parquet}),
bl AS (
  SELECT t.conv_id, t.turn_idx, t.extracted_text, t.label, s.ts
  FROM tw t JOIN srcts s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
  WHERE t."rank" = 1 OR t."rank" IS NULL),
st AS MATERIALIZED (
  SELECT concat(conv_id, '#', CAST(turn_idx AS VARCHAR)) AS id,
         conv_id, turn_idx,
         CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS ts_ms,
         ts AS created_at,
         label AS grp,
         CASE WHEN label IS NOT NULL THEN 'extracted'
              ELSE 'pending_grouping' END AS status,
         array_to_string((string_split(coalesce(extracted_text, ''), ' '))[1:4], ' ') AS d,
         concat(conv_id, '_', CAST(turn_idx AS VARCHAR), '.txt') AS original_name
  FROM bl),
words AS (
  SELECT id, regexp_split_to_array(lower(d), '\\s+') AS w, d <> '' AS has_d
  FROM st),
scored AS (
  SELECT p.tid, p.cid, p.c_ts, p.c_status, p.c_earlier,
         ({tier}) + (CASE WHEN {decay} > 0.0 THEN {decay} ELSE 0.0 END) * 0.2
           AS score
  FROM (
    SELECT t.id AS tid, c.id AS cid, c.ts_ms AS c_ts, c.status AS c_status,
           abs(c.ts_ms - t.ts_ms) AS dt,
           (c.ts_ms < t.ts_ms OR (c.ts_ms = t.ts_ms AND c.id < t.id)) AS c_earlier,
           t.id AS t_id, c.id AS c_id2
    FROM st t JOIN st c ON t.conv_id = c.conv_id AND t.id <> c.id
     AND abs(c.ts_ms - t.ts_ms) <= 120000
    WHERE t.status = 'pending_grouping') p
  JOIN words wt ON wt.id = p.tid
  JOIN words wc ON wc.id = p.cid),
edges AS MATERIALIZED (SELECT * FROM scored WHERE score > 0.35),
reach AS (
  SELECT e.tid AS id FROM edges e WHERE e.c_status = 'extracted'
  UNION
  SELECT e.tid FROM edges e JOIN reach r ON e.cid = r.id AND e.c_earlier),
best AS (
  SELECT tid, cid, score FROM (
    SELECT e.tid, e.cid, e.score,
           row_number() OVER (PARTITION BY e.tid
                              ORDER BY e.score DESC, e.c_ts, e.cid) AS rn
    FROM edges e
    WHERE e.c_status = 'extracted'
       OR (e.c_earlier AND EXISTS (SELECT 1 FROM reach r WHERE r.id = e.cid))
  ) q WHERE rn = 1),
prop AS (
  SELECT id, grp FROM st WHERE status = 'extracted' AND grp IS NOT NULL
  UNION ALL
  SELECT b.tid, p.grp FROM best b JOIN prop p ON b.cid = p.id),
assigned AS (
  SELECT b.tid AS id, p.grp, least(b.score, 1.0) AS conf
  FROM best b JOIN prop p ON p.id = b.tid),
m AS (
  SELECT s.id, s.conv_id, s.turn_idx, s.created_at, s.original_name,
         coalesce(a.grp, s.grp) AS grp,
         CASE WHEN s.status = 'extracted' THEN 'extracted'
              WHEN a.id IS NOT NULL THEN 'auto_grouped'
              ELSE 'ungrouped' END AS status,
         CASE WHEN s.status = 'extracted' THEN 1.0
              WHEN a.id IS NOT NULL THEN a.conf ELSE 0.0 END
           AS grouping_confidence
  FROM st s LEFT JOIN assigned a ON a.id = s.id),
named AS (
  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY created_at, id) AS g_rn
  FROM m),
with_name AS (
  SELECT *, CASE WHEN grp IS NOT NULL THEN
      concat({_sanitize('grp')},
             CASE WHEN g_rn > 1 THEN concat('_', CAST(g_rn AS VARCHAR))
                  ELSE '' END,
             {_EXT}) END AS new_name0
  FROM named),
dup AS (
  SELECT *, CASE WHEN new_name0 IS NOT NULL AND new_name0 <> ''
                 THEN row_number() OVER (PARTITION BY new_name0
                                         ORDER BY created_at, id)
                 ELSE 1 END AS dup_rank
  FROM with_name)
SELECT id, conv_id, turn_idx, grp AS "group", status, grouping_confidence,
       CASE WHEN dup_rank > 1 THEN
         concat({_sanitize("coalesce(grp, 'ungrouped')")},
                CASE WHEN g_rn > 1 THEN concat('_', CAST(g_rn AS VARCHAR))
                     ELSE '' END,
                {_EXT})
       ELSE new_name0 END AS new_name
FROM dup
"""
