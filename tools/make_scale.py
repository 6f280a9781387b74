#!/usr/bin/env python3
"""Scale a testdata sf directory by an integer factor (default 10),
preserving the star schema's FK structure: sf1 = 10 x sf0.1.

Usage: python3 tools/make_scale.py [<src_dir> <dst_dir> [factor]]

Design (the honest-scaling rules):
  - Keys are dense 0..N-1 per table, so copy i offsets every key (and
    every FK referencing it) by i * N_table. region/nation are fixed
    dimensions and copy through unchanged.
  - Value columns (prices, dates, event timestamps) copy through
    unchanged: date/segment filters keep selecting the same FRACTION of
    rows, so filter pruning behaves as it would on organically larger
    data.
  - documents.text and embeddings.embedding must NOT be verbatim copies:
    10 exact (or near-exact) clones per document would hand the
    near-dup/banding queries a synthetic 10-clone cluster per input row
    and inflate their pair outputs quadratically — a scaling artifact,
    not a scaling measurement. Copy i > 0 CROSS-BREEDS row d with row
    (d + i*37) mod N: text takes the first half of one word list and
    the second half of the other (shingle Jaccard vs either parent well
    below the 0.7 near-dup threshold), embeddings take a fixed-weight
    blend of the two parents (cosine vs either parent ~0.7-0.8, below
    near-dup thresholds), keeping global token/vector statistics
    realistic while every synthetic row stays distinct. Deterministic —
    no RNG anywhere, so re-runs are byte-stable.
"""
import os
import sys

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({k})) AS ci")

    def t(name):
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name, sql):
        out = f"{dst}/{name}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    counts = {name: con.execute(
        f"SELECT count(*) FROM {t(name)}").fetchone()[0]
        for name in ["customer", "supplier", "part", "orders", "lineitem",
                     "events", "documents", "embeddings"]}
    nc, ns, np_, no = (counts["customer"], counts["supplier"],
                       counts["part"], counts["orders"])
    nd, nv, ne = counts["documents"], counts["embeddings"], counts["events"]

    # fixed dimensions: copy through
    for name in ["region", "nation"]:
        write(name, f"SELECT * FROM {t(name)}")

    write("customer", f"""
      SELECT c_custkey + ci * {nc} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM {t('customer')}, copies""")
    write("supplier", f"""
      SELECT s_suppkey + ci * {ns} AS s_suppkey, s_name, s_nationkey,
             s_acctbal
      FROM {t('supplier')}, copies""")
    write("part", f"""
      SELECT p_partkey + ci * {np_} AS p_partkey, p_name, p_brand, p_type,
             p_size, p_retailprice
      FROM {t('part')}, copies""")
    write("orders", f"""
      SELECT o_orderkey + ci * {no} AS o_orderkey,
             o_custkey + ci * {nc} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM {t('orders')}, copies""")
    write("lineitem", f"""
      SELECT l_orderkey + ci * {no} AS l_orderkey,
             l_partkey + ci * {np_} AS l_partkey,
             l_suppkey + ci * {ns} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM {t('lineitem')}, copies""")
    # events: user population scales with the customer-ish user_id space
    nu = con.execute(
        f"SELECT max(user_id) + 1 FROM {t('events')}").fetchone()[0]
    write("events", f"""
      SELECT event_id + ci * {ne} AS event_id, ts,
             user_id + ci * {nu} AS user_id, event_type, value, props
      FROM {t('events')}, copies""")

    # documents: copy 0 verbatim; copy i cross-breeds d with (d + i*37) % nd
    write("documents", f"""
      WITH src AS (SELECT doc_id, string_split(text, ' ') AS w, lang,
                          source
                   FROM {t('documents')})
      SELECT a.doc_id + ci * {nd} AS doc_id,
             CASE WHEN ci = 0 THEN array_to_string(a.w, ' ')
                  ELSE array_to_string(
                    list_concat(a.w[1 : len(a.w) // 2],
                                b.w[len(b.w) // 2 + 1 : len(b.w)]), ' ')
             END AS text,
             a.lang, a.source,
             CAST(len(CASE WHEN ci = 0 THEN array_to_string(a.w, ' ')
                  ELSE array_to_string(
                    list_concat(a.w[1 : len(a.w) // 2],
                                b.w[len(b.w) // 2 + 1 : len(b.w)]), ' ')
             END) AS BIGINT) AS n_chars
      FROM src a, copies
      JOIN src b ON b.doc_id = (a.doc_id + ci * 37) % {nd}""")

    # embeddings: copy 0 verbatim; copy i blends d with (d + i*37) % nv
    write("embeddings", f"""
      WITH src AS (SELECT vec_id, embedding, label FROM {t('embeddings')})
      SELECT a.vec_id + ci * {nv} AS vec_id,
             CASE WHEN ci = 0 THEN a.embedding
                  ELSE list_transform(range(1, len(a.embedding) + 1),
                    j -> CAST(0.6 * a.embedding[j] + 0.8 * b.embedding[j]
                              AS FLOAT))
             END AS embedding,
             a.label
      FROM src a, copies
      JOIN src b ON b.vec_id = (a.vec_id + ci * 37) % {nv}""")
    print("done ->", dst)


if __name__ == "__main__":
    main()
