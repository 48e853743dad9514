"""Scale-up generator: tile /root/testdata/sf0.1 10x into .scale/sf1.

The driver ships sf0.001/0.01/0.1 only; VERDICT r5 asked for a bench one
order of magnitude up to exercise the shuffle-bound claims.  This tool
derives an sf1-equivalent dataset from sf0.1 WITHOUT inventing new
distributions: every table is 10 key-offset copies of the shipped data,
so marginal distributions, join fan-outs and per-key densities are
exactly those of the driver's generator.

Two tables need more than a key offset, because naive replication would
make every copy a perfect duplicate of every other and near-dup
operators would see a quadratic cross-copy pair blowup that no real
corpus has:

- ``documents``: copy i > 0 rewrites every word ``w -> w_ci``.  An
  injective per-word map preserves the intra-copy shingle structure
  EXACTLY (the sf0.1 near-dup pairs exist in every copy, with identical
  Jaccard), while cross-copy shingle sets are disjoint.
- ``embeddings``: copy i > 0 applies a per-copy signed permutation of
  the 64 dims (a random orthogonal matrix from the hyperoctahedral
  group).  Orthogonality preserves every intra-copy inner product and
  norm EXACTLY — each copy is an isometric replica of the workload —
  while cross-copy cosines are ~N(0, 1/sqrt(dim)), far below any
  near-dup threshold.

Copy 0 is byte-identical to sf0.1, so sf0.1 results embed in sf1.
Deterministic (seed 42).  Output is gitignored scratch: ~10x sf0.1
(~170 MB parquet).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_DST_SF",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scale", "sf1"),
)
COPIES = int(os.environ.get("SPARK_GRAFT_COPIES", "10"))
SEED = 42


def _stride(con: duckdb.DuckDBPyConnection, table: str, key: str) -> int:
    return con.execute(
        f"select max({key}) + 1 from read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def gen_relational(con: duckdb.DuckDBPyConnection) -> None:
    c = _stride(con, "customer", "c_custkey")
    s = _stride(con, "supplier", "s_suppkey")
    p = _stride(con, "part", "p_partkey")
    o = _stride(con, "orders", "o_orderkey")
    e = _stride(con, "events", "event_id")
    u = _stride(con, "events", "user_id")
    d = _stride(con, "documents", "doc_id")
    copies = f"(select unnest(range({COPIES})) as copy)"

    jobs = {
        # dims region/nation stay fixed (they are enumerations, and the
        # engine's broadcast-threshold argument assumes dims grow sublinearly)
        "region": f"select * from read_parquet('{SRC}/region.parquet')",
        "nation": f"select * from read_parquet('{SRC}/nation.parquet')",
        "customer": f"""
            select c_custkey + copy * {c} as c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            from read_parquet('{SRC}/customer.parquet'), {copies}""",
        "supplier": f"""
            select s_suppkey + copy * {s} as s_suppkey,
                   s_name, s_nationkey, s_acctbal
            from read_parquet('{SRC}/supplier.parquet'), {copies}""",
        "part": f"""
            select p_partkey + copy * {p} as p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            from read_parquet('{SRC}/part.parquet'), {copies}""",
        "orders": f"""
            select o_orderkey + copy * {o} as o_orderkey,
                   o_custkey + copy * {c} as o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            from read_parquet('{SRC}/orders.parquet'), {copies}""",
        "lineitem": f"""
            select l_orderkey + copy * {o} as l_orderkey,
                   l_partkey + copy * {p} as l_partkey,
                   l_suppkey + copy * {s} as l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            from read_parquet('{SRC}/lineitem.parquet'), {copies}""",
        "events": f"""
            select event_id + copy * {e} as event_id, ts,
                   user_id + copy * {u} as user_id,
                   event_type, value, props
            from read_parquet('{SRC}/events.parquet'), {copies}""",
        # injective per-word rewrite; n_chars recomputed to stay consistent
        "documents": f"""
            select doc_id + copy * {d} as doc_id,
                   case when copy = 0 then text
                        else regexp_replace(text, '(\\S+)',
                                            '\\1_c' || copy::varchar, 'g')
                   end as text,
                   lang, source,
                   case when copy = 0 then n_chars
                        else length(regexp_replace(text, '(\\S+)',
                                    '\\1_c' || copy::varchar, 'g'))
                   end as n_chars
            from read_parquet('{SRC}/documents.parquet'), {copies}""",
    }
    # Row-group sizing: Spark parallelizes a parquet scan at ROW-GROUP
    # granularity, and these tables are byte-small but CPU-heavy per row
    # (shingling, HOFs) — a single-row-group documents.parquet ran the
    # whole text family single-task.  ~16-32 groups per table mirrors
    # the many-splits layout any production corpus has.
    row_groups = {
        "customer": 8192, "supplier": 8192, "part": 8192,
        "orders": 65536, "lineitem": 262144, "events": 65536,
        "documents": 2048,
    }
    for table, sql in jobs.items():
        rg = row_groups.get(table)
        opts = "format parquet, compression snappy" + (
            f", row_group_size {rg}" if rg else ""
        )
        con.execute(
            f"copy ({sql}) to '{DST}/{table}.parquet' ({opts})"
        )
        n = con.execute(
            f"select count(*) from read_parquet('{DST}/{table}.parquet')"
        ).fetchone()[0]
        print(f"  {table}: {n} rows", file=sys.stderr)


def gen_embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    n, dim = emb.shape
    stride = int(vec_id.max()) + 1
    rng = np.random.default_rng(SEED)

    ids, vecs, labels = [vec_id], [emb], [label]
    for copy in range(1, COPIES):
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        vecs.append(emb[:, perm] * signs)  # orthogonal: isometric replica
        ids.append(vec_id + copy * stride)
        labels.append(label)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
        "embedding": pa.array(
            [v.tolist() for v in np.concatenate(vecs)],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array(np.concatenate(labels), type=pa.int32()),
    })
    pq.write_table(
        out,
        f"{DST}/embeddings.parquet",
        compression="snappy",
        row_group_size=1024,
    )
    print(f"  embeddings: {out.num_rows} rows", file=sys.stderr)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    print(f"# tiling {SRC} x{COPIES} -> {DST}", file=sys.stderr)
    gen_relational(con)
    gen_embeddings()
    print("# done", file=sys.stderr)


if __name__ == "__main__":
    main()
