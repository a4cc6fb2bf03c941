#!/usr/bin/env python3
"""Constant-DENSITY 10x document stress data (VERDICT r9 ask #7).

make_sf1.py replicates each sf0.1 document with only a short
' replicaN markerN' suffix, so every replica pair of the same base doc
is a TRUE near-duplicate: the exact answer to dd_setsim_join grows
quadratically in the replica count — a generator artifact, not an
operator property (documented at tools/scale_check.sh).

This variant grows the corpus 10x while keeping near-dup DENSITY
constant, the shape a real 10x web corpus has: replica i>0 rewrites
every whitespace token t as 'r{i}{t}'. Each replica is then token-
DISJOINT from every other replica (cross-replica Jaccard = 0, so no
cross-replica pairs at tau=0.6), while pairs WITHIN a replica mirror
the base corpus exactly (same shingle-set structure under renamed
tokens). True answer = 10 x the base pair count — linear by
construction — so the measured dd_setsim_join ratio at 10x isolates
the OPERATOR's scaling from the data's.

Writes only documents.parquet (the one table dd_setsim_join reads);
the other sf0.1 tables are symlinked so the dir satisfies any scan
the harness does on the way in.

Dev-side tool like make_sf1.py; the engine never synthesizes data.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SFDENSE_DIR", "/root/repo/target/sfdense")
R = int(os.environ.get("SF_REPLICAS", "10"))

os.makedirs(DST, exist_ok=True)

docs = pq.read_table(f"{SRC}/documents.parquet")
shift = int(pa.compute.max(docs["doc_id"]).as_py()) + 1

ids = docs["doc_id"].to_pylist()
texts = docs["text"].to_pylist()
langs = docs["lang"].to_pylist()
sources = docs["source"].to_pylist()

out_id, out_text, out_lang, out_src, out_n = [], [], [], [], []
for i in range(R):
    for d, t, lg, sc in zip(ids, texts, langs, sources):
        nt = t if i == 0 else " ".join(f"r{i}{w}" for w in t.split(" "))
        out_id.append(d + shift * i)
        out_text.append(nt)
        out_lang.append(lg)
        out_src.append(sc)
        out_n.append(len(nt))

tab = pa.Table.from_arrays(
    [pa.array(out_id, type=docs.schema.field("doc_id").type),
     pa.array(out_text, type=docs.schema.field("text").type),
     pa.array(out_lang, type=docs.schema.field("lang").type),
     pa.array(out_src, type=docs.schema.field("source").type),
     pa.array(out_n, type=docs.schema.field("n_chars").type)],
    schema=docs.schema)
pq.write_table(tab, f"{DST}/documents.parquet")
print(f"documents: {tab.num_rows} rows -> {DST}")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    dst = f"{DST}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done")
