"""DuckDB oracle SQL for the quantized ANN serve paths (VERDICT r7 #1).

The three remaining rows-only ANN variants (e3_pq_topk, e3_ivfpq_topk,
e3_quantized_topk) become full value oracles here by the same recipe
that upgraded e3_ivf_topk / e3_lsh_topk / e3_matryoshka_topk in round
7: every data-dependent decision (codeword assignment, coarse-cell
routing, probe choice, shortlist rank, final rank) is taken on a
ROUNDED key with an id/index tie-break — encoded as one scalar for
arg_min/arg_max — so both engines decide identically except at a
rounding boundary (the measure-zero exposure every rounded-sim oracle
in this repo accepts), and the quantizers themselves are the FROZEN
pretrained arrays of operators/frozen_ann.py, embedded below as DOUBLE
literals (the ``e0`` suffix matters: a bare decimal literal parses as
DECIMAL and its double cast can lose the last ulp).

The SQL replays the ENTIRE index lifecycle per query — PQ: encode the
corpus to 16 one-byte codes (arg_min over round(||c||^2 - 2 x.c, 4)),
ADC-score every candidate from per-query LUTs, top-32 shortlist on
round(sim, 6), exact cosine re-rank; IVF-PQ: additionally the unit
normalization, rounded coarse-cell assignment, residual codes via the
cross-term decomposition dot(res_s, c) = dot(x_s, c) - dot(cn_s, c),
and rounded probe routing; INT8: bit-exact dequantization (the
mn + (code + 0.5) * scale expression is the same IEEE-double
arithmetic in both engines). Corpus sizes are small in fixtures
(<= 2000 vectors), so the 2M-row assignment cross joins are trivial
for DuckDB; the SPARK side never materializes those joins — it runs
the broadcast-LUT Arrow kernels of operators/pq.py.
"""

from __future__ import annotations

import numpy as np

from ..operators import frozen_ann

_DSUB = 4
_REFINE = 32
_K = 3
_NQ = 5


def _f(x: float) -> str:
    """Exact DOUBLE literal: repr round-trips float64; 'e0' forces
    DuckDB's DOUBLE parser (bare decimals become DECIMAL)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r) else r + "e0"


def _flist(v) -> str:
    return "[" + ", ".join(_f(x) for x in v) + "]"


def _cb_values(books: "np.ndarray") -> str:
    """VALUES rows (s, j, bv, cc2) for a (m, ksub, dsub) codebook; cc2
    is precomputed in numpy so the literal equals the kernel's
    (books**2).sum(axis=2) bit for bit."""
    rows = []
    for s in range(books.shape[0]):
        cc2 = (books[s] ** 2).sum(axis=1)
        for j in range(books.shape[1]):
            rows.append(f"({s}, {j}, {_flist(books[s][j])}, {_f(cc2[j])})")
    return ",\n      ".join(rows)


def _cn_values(cn: "np.ndarray") -> str:
    return ",\n      ".join(
        f"({cell}, {_flist(cn[cell])})" for cell in range(cn.shape[0])
    )


_SUB = f"list_slice({{v}}, cb.s * {_DSUB} + 1, cb.s * {_DSUB} + {_DSUB})"

_RERANK = f"""
    rer AS (
      SELECT s.query_id, s.neighbor_id,
             round(list_dot_product(q.qv, n.v) /
                   (sqrt(list_dot_product(q.qv, q.qv)) *
                    sqrt(list_dot_product(n.v, n.v))), 4) AS sim
      FROM short s
      JOIN q ON q.qid = s.query_id
      JOIN c n ON n.id = s.neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, sim FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id)
                  AS INTEGER) AS rnk
      FROM rer
    ) WHERE rnk <= {_K}
    """


def pq_oracle_sql() -> str:
    books = frozen_ann.PQ_BOOKS
    return f"""
    WITH cb(s, j, bv, cc2) AS (VALUES
      {_cb_values(books)}
    ),
    c AS (
      SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    asg AS (
      SELECT c.id, cb.s,
             arg_min(cb.j,
                     round(cb.cc2 - 2 * list_dot_product({_SUB.format(v='c.v')}, cb.bv), 4)
                       * 1000000 + cb.j) AS code
      FROM c CROSS JOIN cb
      GROUP BY c.id, cb.s
    ),
    q AS (
      SELECT id AS qid, v AS qv, sqrt(list_dot_product(v, v)) AS qn
      FROM c WHERE id < {_NQ}
    ),
    lut AS (
      SELECT q.qid, cb.s, cb.j,
             list_dot_product({_SUB.format(v='q.qv')}, cb.bv) / q.qn AS d
      FROM q CROSS JOIN cb
    ),
    adc AS (
      SELECT lut.qid AS query_id, asg.id AS neighbor_id,
             round(sum(lut.d) / sqrt(greatest(sum(cbn.cc2), 1e-30)), 6) AS sim
      FROM asg
      JOIN cb cbn ON cbn.s = asg.s AND cbn.j = asg.code
      JOIN lut ON lut.s = asg.s AND lut.j = asg.code
      WHERE asg.id <> lut.qid
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {_REFINE}
    ),
    {_RERANK}
    """


def ivfpq_oracle_sql() -> str:
    books = frozen_ann.IVFPQ_BOOKS
    cn = frozen_ann.IVFPQ_CN
    n_probe = 6
    return f"""
    WITH cb(s, j, bv, cc2) AS (VALUES
      {_cb_values(books)}
    ),
    cn(cell, cv) AS (VALUES
      {_cn_values(cn)}
    ),
    c AS (
      SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    xn AS (
      SELECT id, v,
             list_transform(v, e -> e / greatest(sqrt(list_dot_product(v, v)), 1e-30)) AS u
      FROM c
    ),
    cells AS (
      SELECT xn.id,
             arg_max(cn.cell,
                     round(list_dot_product(xn.u, cn.cv), 6) * 100000000 - cn.cell)
               AS cell
      FROM xn CROSS JOIN cn
      GROUP BY xn.id
    ),
    crt AS (
      SELECT cn.cell, cb.s, cb.j,
             list_dot_product({_SUB.format(v='cn.cv')}, cb.bv) AS cr
      FROM cn CROSS JOIN cb
    ),
    codes AS (
      SELECT xn.id, cells.cell, cb.s,
             arg_min(cb.j,
                     round(cb.cc2
                           - 2 * (list_dot_product({_SUB.format(v='xn.u')}, cb.bv)
                                  - crt.cr), 4) * 1000000 + cb.j) AS code
      FROM xn
      JOIN cells ON cells.id = xn.id
      CROSS JOIN cb
      JOIN crt ON crt.cell = cells.cell AND crt.s = cb.s AND crt.j = cb.j
      GROUP BY xn.id, cells.cell, cb.s
    ),
    q AS (
      SELECT xn.id AS qid, xn.u AS qu, c.v AS qv
      FROM xn JOIN c ON c.id = xn.id
      WHERE xn.id < {_NQ}
    ),
    qc AS (
      SELECT q.qid, cn.cell, list_dot_product(q.qu, cn.cv) AS qcv
      FROM q CROSS JOIN cn
    ),
    probes AS (
      SELECT qid, cell FROM (
        SELECT qid, cell,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(qcv, 6) DESC, cell) AS rn
        FROM qc
      ) WHERE rn <= {n_probe}
    ),
    qr AS (
      SELECT q.qid, cb.s, cb.j,
             list_dot_product({_SUB.format(v='q.qu')}, cb.bv) AS d
      FROM q CROSS JOIN cb
    ),
    adc AS (
      SELECT probes.qid AS query_id, codes.id AS neighbor_id,
             round((min(qc.qcv) + sum(qr.d)) /
                   sqrt(greatest(1.0e0 + sum(2 * crt.cr + cb.cc2), 1e-30)), 6)
               AS sim
      FROM probes
      JOIN codes ON codes.cell = probes.cell AND codes.id <> probes.qid
      JOIN qr ON qr.qid = probes.qid AND qr.s = codes.s AND qr.j = codes.code
      JOIN crt ON crt.cell = codes.cell AND crt.s = codes.s AND crt.j = codes.code
      JOIN cb ON cb.s = codes.s AND cb.j = codes.code
      JOIN qc ON qc.qid = probes.qid AND qc.cell = probes.cell
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {_REFINE}
    ),
    {_RERANK}
    """


def quantized_oracle_sql() -> str:
    return f"""
    WITH c AS (
      SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    st AS (SELECT id, v, list_min(v) AS mn, list_max(v) AS mx FROM c),
    recon AS (
      SELECT id,
             CASE WHEN mx = mn THEN list_transform(v, x -> mn)
                  ELSE list_transform(v, x ->
                         mn + (least(floor((x - mn) / ((mx - mn) / 256.0e0)),
                                     255.0e0) + 0.5e0)
                              * ((mx - mn) / 256.0e0))
             END AS r
      FROM st
    ),
    q AS (
      SELECT id AS qid, v AS qv,
             greatest(sqrt(list_dot_product(v, v)), 1e-30) AS qn
      FROM c WHERE id < {_NQ}
    ),
    scored AS (
      SELECT q.qid AS query_id, recon.id AS neighbor_id,
             round(list_dot_product(recon.r, q.qv) /
                   (greatest(sqrt(list_dot_product(recon.r, recon.r)), 1e-30)
                    * q.qn), 6) AS sim6
      FROM recon CROSS JOIN q
      WHERE recon.id <> q.qid
    )
    SELECT query_id, neighbor_id, rnk, sim FROM (
      SELECT query_id, neighbor_id, round(sim6, 4) AS sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim6 DESC, neighbor_id)
                  AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= {_K}
    """


def ivfkm_frozen_oracle_sql() -> str:
    """Full oracle for e3_ivf_kmeans_frozen_topk (round 11): the
    e3_ivf_topk replay with the coarse quantizer swapped for the FROZEN
    spherical k-means centroids (operators/frozen_ivfkm.py — the live
    Lloyd fit frozen once, the same stance as PQ_BOOKS/IVFPQ_CN).
    Assignment, probe routing, and final rank all decide on rounded
    similarities with id tie-breaks, so both engines agree everywhere
    off a rounding boundary."""
    from ..operators.frozen_ivfkm import CENTROIDS

    cents = ",\n      ".join(
        f"({cell}, {_flist(row)})" for cell, row in enumerate(CENTROIDS)
    )
    cos_cv = (
        "round(list_dot_product(v, cv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 4)"
    )
    cos_qcv = (
        "round(list_dot_product(qv, cv) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4)"
    )
    cos_qv = (
        "round(list_dot_product(qv, dv.v) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(dv.v, dv.v))), 4)"
    )
    return f"""
    WITH cents(cell, cv) AS (VALUES
      {cents}
    ),
    c AS (
      SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assign_scored AS (
      SELECT c.id, cents.cell, ({cos_cv}) AS cs
      FROM c CROSS JOIN cents
    ),
    cells AS (
      SELECT id, arg_max(cell, cs * 100000000 - cell) AS cell
      FROM assign_scored GROUP BY id
    ),
    q AS (SELECT id AS query_id, v AS qv FROM c WHERE id < 5),
    probe_scored AS (
      SELECT query_id, cell, ({cos_qcv}) AS pcs
      FROM q CROSS JOIN cents
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY pcs DESC, cell) AS rn
        FROM probe_scored
      ) WHERE rn <= 6
    ),
    cand AS (
      SELECT q.query_id, dv.id AS neighbor_id, ({cos_qv}) AS sim
      FROM probes
      JOIN cells ON probes.cell = cells.cell
      JOIN c dv ON dv.id = cells.id
      JOIN q ON q.query_id = probes.query_id
      WHERE dv.id <> q.query_id
    )
    SELECT query_id, neighbor_id, rnk, sim FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id)
                  AS INTEGER) AS rnk
      FROM cand
    ) WHERE rnk <= {_K}
    """
