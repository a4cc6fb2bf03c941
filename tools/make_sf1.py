#!/usr/bin/env python3
"""Generate stress data replicated from sf0.1 (default 10x under
target/sf1; SF_REPLICAS=100 + SF1_DIR=target/sf10 gives the 100x point).

Dev-side tool (like tools/check.py): the engine itself never synthesizes
data; this exists only for the SCALE.md stress run, because the driver
ships testdata up to sf0.1 while the scale ask is "~6M lineitem".

Derivation is mechanical from /root/testdata/sf0.1 with replica key
shifts (replica i shifts every key column by i * (max_key + 1)), so
referential joins keep working:
  - region/nation: copied (dimension tables)
  - customer/supplier/part/orders/lineitem: 10 shifted replicas
  - events: 10 replicas, event_id/user_id shifted, timestamps shifted
    by i * (span + 1 day) so the event stream EXTENDS in time: a real
    10x event corpus covers more wall-clock, keeping per-hour density
    constant (verbatim timestamps would make every time band 10x denser
    and banded interval joins quadratically heavier than real growth —
    the same reasoning as the document marker suffix below)
  - documents: 10 replicas, doc_id shifted; replica text gets a
    ' replicaN markerN' suffix so dedup workloads grow ~linearly
    (verbatim copies would make every LSH bucket 10x denser and the
    pair joins quadratically heavier than real 10x corpora)
  - embeddings: 10 replicas, vec_id shifted; replica vectors rotated
    by i components for the same reason
"""
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/root/repo/target/sf1")
R = int(os.environ.get("SF_REPLICAS", "10"))

os.makedirs(DST, exist_ok=True)


def load(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def save(t, tab):
    pq.write_table(tab, f"{DST}/{t}.parquet")
    print(f"{t}: {tab.num_rows} rows")


def shift_of(tab, col):
    return int(pa.compute.max(tab[col]).as_py()) + 1


def replicate(tab, shifts, transform=None):
    outs = []
    for i in range(R):
        cols = []
        for name in tab.column_names:
            arr = tab[name].combine_chunks()
            if i > 0 and name in shifts:
                arr = pa.compute.add(arr, shifts[name] * i).cast(tab.schema.field(name).type)
            cols.append(arr)
        t = pa.Table.from_arrays(cols, schema=tab.schema)
        if transform is not None:
            t = transform(t, i)
        outs.append(t)
    return pa.concat_tables(outs)


for t in ["region", "nation"]:
    save(t, load(t))

cust = load("customer")
CS = shift_of(cust, "c_custkey")
save("customer", replicate(cust, {"c_custkey": CS}))

supp = load("supplier")
SS = shift_of(supp, "s_suppkey")
save("supplier", replicate(supp, {"s_suppkey": SS}))

part = load("part")
PS = shift_of(part, "p_partkey")
save("part", replicate(part, {"p_partkey": PS}))

orders = load("orders")
OS = shift_of(orders, "o_orderkey")
save("orders", replicate(orders, {"o_orderkey": OS, "o_custkey": CS}))

li = load("lineitem")
save("lineitem", replicate(
    li, {"l_orderkey": OS, "l_partkey": PS, "l_suppkey": SS}))

ev = load("events")
_ts = ev["ts"].combine_chunks().cast(pa.int64())
_span_us = int(pa.compute.max(_ts).as_py()) - int(pa.compute.min(_ts).as_py())
_ts_shift = _span_us + 86_400_000_000  # span + 1 day of clearance


def ev_transform(t, i):
    if i == 0:
        return t
    cols = []
    for name in t.column_names:
        arr = t[name].combine_chunks()
        if name == "ts":
            arr = pa.compute.add(arr.cast(pa.int64()), _ts_shift * i) \
                .cast(t.schema.field(name).type)
        cols.append(arr)
    return pa.Table.from_arrays(cols, schema=t.schema)


save("events", replicate(
    ev, {"event_id": shift_of(ev, "event_id"), "user_id": shift_of(ev, "user_id")},
    transform=ev_transform))


def doc_transform(t, i):
    if i == 0:
        return t
    suffix = f" replica{i} marker{i}"
    text = pa.compute.binary_join_element_wise(
        t["text"].combine_chunks(), pa.scalar(suffix), pa.scalar(""))
    n_chars = pa.compute.utf8_length(text).cast(pa.int64())
    cols = {name: t[name] for name in t.column_names}
    cols["text"] = text
    cols["n_chars"] = n_chars
    return pa.Table.from_arrays(
        [cols[n].combine_chunks() if hasattr(cols[n], "combine_chunks") else cols[n]
         for n in t.column_names], schema=t.schema)


docs = load("documents")
save("documents", replicate(
    docs, {"doc_id": shift_of(docs, "doc_id")}, transform=doc_transform))


def emb_transform(t, i):
    if i == 0:
        return t
    emb = t["embedding"].combine_chunks()
    mat = np.array(emb.to_pylist(), dtype=np.float32)
    # roll wraps at the vector width: replica i = width would be an EXACT
    # copy of the original (a synthetic dup explosion real 100x corpora
    # don't have), so wrapped rounds are negated to stay distinct
    w = mat.shape[1]
    # roll + sign distinguishes only 2*w replicas (replica i and i-2w
    # share both) — fail loudly rather than silently emit exact dups at
    # the next scale step
    assert R <= 2 * w, (
        f"SF_REPLICAS={R} > 2*width={2*w}: replicas past 2*width "
        "repeat roll+sign exactly; add a third distinguisher first")
    mat = np.roll(mat, i % w, axis=1)
    if i >= w:
        mat = -mat
    rolled = pa.array(list(mat), type=t.schema.field("embedding").type)
    cols = [t[n].combine_chunks() if n != "embedding" else rolled
            for n in t.column_names]
    return pa.Table.from_arrays(cols, schema=t.schema)


emb = load("embeddings")
save("embeddings", replicate(
    emb, {"vec_id": shift_of(emb, "vec_id")}, transform=emb_transform))

print("sf1 written to", DST)
