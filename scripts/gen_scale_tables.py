"""Generate the sf1 (and optionally sf10) steps for the scale harness
(scripts/scale_step.py).

The driver ships sf0.001/0.01/0.1 read-only; the 100 TB question needs
one more decade to confirm the banding/stop-shingle guards hold across
TWO consecutive steps. This generator extends the family one decade,
mirroring the sf0.1 tables' shape so growth factors stay comparable:

  documents  — 10x rows (50,000), length / lang / source
               distributions read from the sf0.1 parquet (not
               hard-coded), similar exact-duplicate (~0.2%) and
               near-duplicate (~0.4%) plant rates. The vocabulary
               GROWS with the corpus (Heaps' law, |V| ∝ sqrt(mult)):
               the sf0.1 base words keep the head ranks of a Zipf(1)
               unigram law (so fixed query probes like BM25's terms
               stay present and frequent) and synthetic tail words
               fill the rest. A CLOSED vocabulary at 500k docs makes
               every 3-shingle's df exceed the stop-shingle guard
               (MAX_SHINGLE_DF=256) — measured at sf10: the guarded
               exact measures lose their entire evidence universe,
               which no Heaps-law corpus does. Fixture realism is the
               point of the scale harness; NOTES_r7 §4 records the
               closed-vocab diagnostic run.
  embeddings — 4x rows (8,000; the sf0.01→sf0.1 step was also 4x),
               10 label-centered gaussian clusters in 64-d, ~1%
               near-identical vector pairs so semantic dedup bites.
  orders / lineitem / events / customer — key-shifted replication
               (`--rel-mult`, default 10): copy c of an entity gets
               key + c*span for every key column (orderkey, custkey,
               event/user ids shift consistently, so order→lineitem,
               order→customer, and event-user→custkey joins all stay
               referentially intact), dates/values/statuses unchanged
               so every date filter keeps its selectivity and every
               per-entity distribution (lines per order, orders per
               customer, events per user) is EXACTLY preserved — the
               "more entities, same behavior" growth model. Pure SQL,
               no RNG, so adding these tables leaves the
               documents/embeddings fixtures bit-identical.
  region / nation / supplier / part — copied verbatim: true dims stay
               fixed while facts grow (the realistic cluster shape —
               and what keeps the broadcast-ability question honest:
               customer GROWS with the facts, so a plan that
               broadcasts it must re-earn that at each decade).

Deterministic (numpy default_rng, fixed seed) and written OUTSIDE
/root/testdata (which is read-only by mandate) — default
<repo>/.scale/sf1, gitignored; only this generator is committed.

Usage: python scripts/gen_scale_tables.py [out_dir] [sf01_dir]
           [--doc-mult N] [--emb-mult N] [--layout spread|onegroup]

Layout: `spread` (default, ~32 row groups per numpy-written table) is
the standing adjudication fixture — realistic corpora ship many row
groups, and the old 1-row-group layout serialized per-row-CPU scan
stages into one task, polluting two rounds of growth numbers
(SCALING_r9/r10). `onegroup` regenerates that pathological layout on
purpose; it remains the unspread-text-CPU-gate fixture. Layout never
changes data values — same seed, same rows.

The multipliers scale relative to the sf0.1 base tables: the defaults
(10, 4) produce sf1; (100, 16) produces sf10 (500k docs / 32k
embeddings — each table keeps its per-decade growth ratio, 10x docs
and 4x embeddings per decade, so growth factors remain comparable
across ALL decades).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
DEFAULT_OUT = REPO / ".scale" / "sf1"
DEFAULT_SF01 = "/root/testdata/sf0.1"
SEED = 421
# Fixture population version, stamped into every output dir. v1 =
# pre-round-7 closed-vocabulary generator; v2 = Heaps-law vocabulary +
# new rng draw order (round 7) — SAME seed, DIFFERENT population, so
# growth factors are only comparable within a version: SCALING_r4-r6
# sf1 rows are v1, SCALING_r7+ rows are v2. The seed stays fixed so
# the r7 sf10 artifacts remain regenerable bit-exact.
FIXTURE_VERSION = 2
DOC_MULT = 10  # default: sf1
EMB_MULT = 4
# Standing layout default (r10 verdict directive #2): ~32 row groups
# per numpy-written table. A single-row-group parquet serializes every
# per-row-CPU stage planned inside the scan into ONE task (Spark
# splits by bytes but tasks align to row groups), which contaminated
# two rounds of growth adjudications (SCALING_r9/r10: pack 3.76x ->
# 2.35x with layout the only variable). Real corpora ship many
# files/row groups, so the spread layout is the realistic default;
# the 1-row-group variant stays available via --layout onegroup as
# the unspread-text-CPU-gate fixture. Layout does NOT change data:
# same seed, same rows, only row-group boundaries differ.
ROW_GROUPS = 32


def gen_documents(
    rng: np.random.Generator, sf01_dir: str, out: Path, mult: int = DOC_MULT,
    row_groups: int = ROW_GROUPS,
) -> int:
    con = duckdb.connect()
    base = con.sql(
        f"SELECT text, lang, source FROM '{sf01_dir}/documents.parquet'"
    ).fetchall()
    vocab = sorted({w for t, _, _ in base for w in t.split()})
    lengths = np.array([len(t.split()) for t, _, _ in base])
    langs = np.array([l for _, l, _ in base])
    sources = np.array(sorted({s for _, _, s in base}))
    n = len(base) * mult

    pick_len = lengths[rng.integers(0, len(lengths), n)]
    # Heaps-law vocabulary with a Zipf(1) unigram law; base words are
    # the head ranks so probe terms keep corpus-wide presence.
    target_vocab = max(len(vocab), int(round(len(vocab) * mult**0.5)))
    full_vocab = np.array(
        list(vocab) + [f"w{i:04d}" for i in range(target_vocab - len(vocab))]
    )
    zipf_p = 1.0 / np.arange(1, len(full_vocab) + 1, dtype=np.float64)
    zipf_p /= zipf_p.sum()
    draws = rng.choice(len(full_vocab), size=int(pick_len.sum()), p=zipf_p)
    bounds = np.concatenate([[0], np.cumsum(pick_len)])
    texts = [
        " ".join(full_vocab[draws[bounds[i] : bounds[i + 1]]])
        for i in range(n)
    ]
    # plant exact duplicates (~0.2%, the sf0.1 rate) ...
    for _ in range(n // 500):
        i, j = sorted(rng.integers(0, n, 2).tolist())
        if i != j:
            texts[j] = texts[i]
    # ... and near-duplicates (~0.4%): one-token substitution of the
    # previous doc — Jaccard well above the 0.5 near-dup bar for the
    # typical ~60-token doc.
    for _ in range(n // 250):
        i = int(rng.integers(0, n - 1))
        toks = texts[i].split()
        if len(toks) < 10:
            continue
        toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts[i + 1] = " ".join(toks)

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[rng.integers(0, len(langs), n)], pa.string()),
            "source": pa.array(sources[rng.integers(0, len(sources), n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(
        tbl, out / "documents.parquet",
        row_group_size=max(1, -(-n // row_groups)),
    )
    return n


def gen_embeddings(
    rng: np.random.Generator, out: Path, mult: int = EMB_MULT,
    row_groups: int = ROW_GROUPS,
) -> int:
    n = 2000 * mult
    labels = rng.integers(0, 10, n)
    centers = rng.normal(0.0, 1.0, (10, 64))
    emb = centers[labels] + rng.normal(0.0, 0.3, (n, 64))
    for _ in range(n // 100):
        i = int(rng.integers(1, n))
        emb[i] = emb[i - 1] + rng.normal(0.0, 0.005, 64)
    emb32 = emb.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(emb32), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(
        tbl, out / "embeddings.parquet",
        row_group_size=max(1, -(-n // row_groups)),
    )
    return n


REL_MULT = 10  # default: sf1-scale facts (10x the sf0.1 base)


# Copies per COPY statement for the replicated tables. DuckDB's COPY
# preserves insertion order by default and buffers the WHOLE ordered
# result before writing — at --rel-mult 1000 the lineitem COPY
# (600M rows) reached >100 GB RSS on a 128 GiB box (observed this
# round; the kernel would have OOM-killed it before a byte landed).
# Chunking the copy range bounds peak memory at CHUNK_COPIES × base
# rows per statement while staying fully deterministic (fixed batch
# boundaries, insertion order preserved within each part). A table
# needing >1 chunk is written as a DIRECTORY `t.parquet/part-NNNN
# .parquet` — the multi-file shape a corpus at that scale ships anyway
# (spread-layout posture); both Spark and DuckDB read it through the
# same path as the single-file form.
CHUNK_COPIES = 100


def gen_relational(sf01_dir: str, out: Path, mult: int = REL_MULT) -> dict[str, int]:
    """Key-shifted replication of the fact tables + customer; true
    dims copied verbatim. See module docstring for the growth model."""
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "customer",
              "region", "nation", "supplier", "part"):
        con.execute(
            f"CREATE VIEW {t}0 AS SELECT * FROM '{sf01_dir}/{t}.parquet'"
        )
    ok_span, ck_span, ev_span = con.execute(
        "SELECT (SELECT MAX(o_orderkey) + 1 FROM orders0),"
        "       (SELECT MAX(c_custkey) + 1 FROM customer0),"
        "       (SELECT MAX(event_id) + 1 FROM events0)"
    ).fetchone()

    def copies_rel(lo: int, hi: int) -> str:
        return f"(SELECT unnest(generate_series({lo}, {hi})) AS c) copies"

    grown = {
        "orders": """
            SELECT o_orderkey + c * {ok} AS o_orderkey,
                   o_custkey + c * {ck} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders0 CROSS JOIN {copies}""",
        "lineitem": """
            SELECT l_orderkey + c * {ok} AS l_orderkey,
                   * EXCLUDE (l_orderkey, c)
            FROM lineitem0 CROSS JOIN {copies}""",
        "customer": """
            SELECT c_custkey + c * {ck} AS c_custkey,
                   * EXCLUDE (c_custkey, c)
            FROM customer0 CROSS JOIN {copies}""",
        "events": """
            SELECT event_id + c * {ev} AS event_id, ts,
                   user_id + c * {ck} AS user_id,
                   event_type, value, props
            FROM events0 CROSS JOIN {copies}""",
    }
    counts = {}
    for t, tpl in grown.items():
        dest = out / (t + ".parquet")
        # Remove any previous output ENTIRELY before writing (r12
        # ADVICE, medium): a re-run with a smaller --rel-mult into the
        # same OUT dir would otherwise leave stale part-NNNN files that
        # silently inflate the fixture — and since Spark and the DuckDB
        # oracle read the same glob, check_oracle cannot detect it. The
        # dir→single-file transition needs the same cleanup.
        if dest.is_dir():
            shutil.rmtree(dest)
        elif dest.exists():
            dest.unlink()
        if mult <= CHUNK_COPIES:
            sql = tpl.format(
                ok=ok_span, ck=ck_span, ev=ev_span,
                copies=copies_rel(0, mult - 1),
            )
            con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        else:
            dest.mkdir(parents=True, exist_ok=True)
            for i, lo in enumerate(range(0, mult, CHUNK_COPIES)):
                hi = min(lo + CHUNK_COPIES, mult) - 1
                sql = tpl.format(
                    ok=ok_span, ck=ck_span, ev=ev_span,
                    copies=copies_rel(lo, hi),
                )
                con.execute(
                    f"COPY ({sql}) TO '{dest / f'part-{i:04d}.parquet'}'"
                    " (FORMAT PARQUET)"
                )
        glob = f"{dest}/*.parquet" if dest.is_dir() else str(dest)
        counts[t] = con.execute(f"SELECT COUNT(*) FROM '{glob}'").fetchone()[0]
    for t in ("region", "nation", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM {t}0) TO '{out / (t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return counts


def main() -> int:
    args = list(sys.argv[1:])
    doc_mult, emb_mult = DOC_MULT, EMB_MULT
    if "--doc-mult" in args:
        i = args.index("--doc-mult")
        doc_mult = int(args[i + 1])
        del args[i : i + 2]
    if "--emb-mult" in args:
        i = args.index("--emb-mult")
        emb_mult = int(args[i + 1])
        del args[i : i + 2]
    rel_mult = REL_MULT
    if "--rel-mult" in args:
        i = args.index("--rel-mult")
        rel_mult = int(args[i + 1])
        del args[i : i + 2]
    layout = "spread"
    if "--layout" in args:
        i = args.index("--layout")
        layout = args[i + 1]
        del args[i : i + 2]
    if layout not in ("spread", "onegroup"):
        print(f"--layout must be spread|onegroup, got {layout!r}", file=sys.stderr)
        return 2
    row_groups = ROW_GROUPS if layout == "spread" else 1
    skip_rel = "--no-rel" in args
    args = [a for a in args if a != "--no-rel"]
    # --no-docs: relational-only fixture (e.g. plan-shape probes of the
    # star-schema queries at a decade whose 5M-doc corpus generation
    # would dominate the wall). Skips documents AND embeddings; rng
    # draw order for them is irrelevant since neither is written.
    skip_docs = "--no-docs" in args
    args = [a for a in args if a != "--no-docs"]
    out = Path(args[0]) if args else DEFAULT_OUT
    sf01 = args[1] if len(args) > 1 else DEFAULT_SF01
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED if (doc_mult, emb_mult) == (DOC_MULT, EMB_MULT) else SEED + 1)
    nd = 0 if skip_docs else gen_documents(rng, sf01, out, mult=doc_mult, row_groups=row_groups)
    ne = 0 if skip_docs else gen_embeddings(rng, out, mult=emb_mult, row_groups=row_groups)
    rel = {} if skip_rel else gen_relational(sf01, out, mult=rel_mult)
    (out / "FIXTURE_VERSION").write_text(
        f"{FIXTURE_VERSION}\nlayout={layout} row_groups={row_groups}\n"
    )
    print(
        f"wrote {out}: documents={nd} embeddings={ne} {rel}"
        f" fixture_version={FIXTURE_VERSION} layout={layout}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
