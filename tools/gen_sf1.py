#!/usr/bin/env python3
"""Generate an N-times-sf0.1 analog of /root/testdata/sf0.1 for the
scale spot-benches: `gen_sf1.py [scale] [dst]` defaults to scale 10 into
/tmp/graft_sf1 (BENCH_r{N}_sf1.json); `gen_sf1.py 100 /tmp/graft_sf10`
builds the 100x point (BENCH_r{N}_sf10 spot-bench).

The driver only ships sf{0.001,0.01,0.1}; scale-curve validation needs
larger data points. This generator reproduces each table's OBSERVABLE
generating process at scale-times the row count (same vocabularies,
marginals, key-space ratios, seed-fixed), rather than replicating sf0.1
rows -- replication would multiply duplicate-cluster sizes and turn
every pair-join family superlinear by construction, poisoning exactly
the scale curves the bench exists to measure.
"""
import collections
import json
import os
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10  # x sf0.1 rows
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
M = SCALE / 10.0  # row counts below are written for the 10x point
rng = np.random.default_rng(4242)
os.makedirs(DST, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(name, table.num_rows)


def empirical(series):
    vals, counts = np.unique(series, return_counts=True)
    return vals, counts / counts.sum()


def sample(series, n):
    vals, p = empirical(series)
    return rng.choice(vals, size=n, p=p)


# region / nation: fixed dimension tables, copied verbatim
for t in ("region", "nation"):
    write(t, pq.read_table(f"{SRC}/{t}.parquet"))

# ---- documents: iid tokens from the empirical token distribution,
# empirical length / lang / source marginals ----
d = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
tok_lists = d.text.str.split()
counter = collections.Counter(t for ts in tok_lists for t in ts)
vocab = np.array(list(counter.keys()))
tok_p = np.array(list(counter.values()), dtype=float)
tok_p /= tok_p.sum()
N_DOC = int(50_000 * M)
lens = sample(tok_lists.str.len().values, N_DOC)
flat = rng.choice(vocab, size=int(lens.sum()), p=tok_p)
texts, off = [], 0
for L in lens:
    texts.append(" ".join(flat[off:off + L]))
    off += L
docs = pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(sample(d.lang.values, N_DOC), pa.string()),
    "source": pa.array(sample(d.source.values, N_DOC), pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
write("documents", docs)

# ---- embeddings: per-label Gaussian clusters fitted from sf0.1,
# L2-normalized like the source vectors ----
e = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
V = np.vstack(e.embedding.values)
N_EMB = int(20_000 * M)
labels = sample(e.label.values, N_EMB).astype(np.int32)
dim = V.shape[1]
vecs = np.empty((N_EMB, dim), dtype=np.float32)
for lb in np.unique(labels):
    src = V[e.label.values == lb]
    mu, sd = src.mean(axis=0), src.std(axis=0)
    m = labels == lb
    vecs[m] = rng.normal(mu, sd, size=(int(m.sum()), dim)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
# ---- planted near-dup pairs (r12 verdict #2): 1% of vectors are
# perturbed copies of other vectors at cos uniform in [0.92, 0.99], so
# the cos >= 0.9 band the LSH recall-holding table scaling exists to
# protect is POPULATED at every scale (iid sampling alone leaves it
# empty and RecallEval's recall_cos09 vacuous). v' = c*v + sqrt(1-c^2)*u
# with u a unit vector orthogonal to v gives exact cosine c. A SEPARATE
# rng keeps every other table's stream byte-identical to the
# pre-planting generator, so bench history stays comparable.
prng = np.random.default_rng(777)
n_plant = N_EMB // 100
src_idx = prng.choice(N_EMB - n_plant, size=n_plant, replace=False)
tgt = prng.uniform(0.92, 0.99, n_plant)
base = vecs[src_idx].astype(np.float64)
w = prng.normal(size=(n_plant, dim))
w -= (w * base).sum(axis=1, keepdims=True) * base
w /= np.linalg.norm(w, axis=1, keepdims=True)
planted = tgt[:, None] * base + np.sqrt(1.0 - tgt ** 2)[:, None] * w
planted /= np.linalg.norm(planted, axis=1, keepdims=True)
vecs[N_EMB - n_plant:] = planted.astype(np.float32)
labels[N_EMB - n_plant:] = labels[src_idx]
emb = pa.table({
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
write("embeddings", emb)

# ---- part: two-word names from the empirical word distributions ----
p = pq.read_table(f"{SRC}/part.parquet").to_pandas()
w = p.p_name.str.split(" ")
N_PART = int(200_000 * M)
pk = np.arange(N_PART)
names = np.char.add(np.char.add(
    sample(w.str[0].values, N_PART).astype(str), " "),
    sample(w.str[1].values, N_PART).astype(str))
part = pa.table({
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": pa.array(names, pa.string()),
    "p_brand": pa.array(sample(p.p_brand.values, N_PART), pa.string()),
    "p_type": pa.array(sample(p.p_type.values, N_PART), pa.string()),
    "p_size": pa.array(sample(p.p_size.values, N_PART), pa.int32()),
    "p_retailprice": pa.array(np.round(900.0 + (pk % 1000) * 0.1, 2),
                              pa.float64()),
})
write("part", part)

# ---- customer / supplier ----
c = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
N_CUST = int(150_000 * M)
cust = pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)], pa.string()),
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": pa.array(np.round(rng.uniform(c.c_acctbal.min(),
        c.c_acctbal.max(), N_CUST), 2), pa.float64()),
    "c_mktsegment": pa.array(sample(c.c_mktsegment.values, N_CUST), pa.string()),
})
write("customer", cust)

s = pq.read_table(f"{SRC}/supplier.parquet").to_pandas()
N_SUPP = int(10_000 * M)
supp = pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)], pa.string()),
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": pa.array(np.round(rng.uniform(s.s_acctbal.min(),
        s.s_acctbal.max(), N_SUPP), 2), pa.float64()),
})
write("supplier", supp)

# ---- orders / lineitem ----
o = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
N_ORD = int(1_500_000 * M)
odate = rng.integers(o.o_orderdate.min().value, o.o_orderdate.max().value,
                     N_ORD)
orders = pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(sample(o.o_orderstatus.values, N_ORD), pa.string()),
    "o_totalprice": pa.array(np.round(rng.uniform(o.o_totalprice.min(),
        o.o_totalprice.max(), N_ORD), 2), pa.float64()),
    "o_orderdate": pa.array((odate // 1000).astype("int64"),
                            pa.timestamp("us")),
    "o_orderpriority": pa.array(sample(o.o_orderpriority.values, N_ORD), pa.string()),
})
write("orders", orders)

li = pq.read_table(f"{SRC}/lineitem.parquet",
                   columns=["l_linenumber", "l_quantity", "l_discount",
                            "l_tax", "l_returnflag", "l_linestatus"]).to_pandas()
lsrc = pq.read_table(f"{SRC}/lineitem.parquet", columns=["l_shipdate"]).to_pandas()
N_LI = int(6_000_000 * M)
ship = rng.integers(lsrc.l_shipdate.min().value, lsrc.l_shipdate.max().value, N_LI)
lineitem = pa.table({
    "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(sample(li.l_linenumber.values, N_LI), pa.int32()),
    "l_quantity": pa.array(sample(li.l_quantity.values, N_LI), pa.float64()),
    "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 100000.0, N_LI), 2),
                                pa.float64()),
    "l_discount": pa.array(sample(li.l_discount.values, N_LI), pa.float64()),
    "l_tax": pa.array(sample(li.l_tax.values, N_LI), pa.float64()),
    "l_returnflag": pa.array(sample(li.l_returnflag.values, N_LI), pa.string()),
    "l_linestatus": pa.array(sample(li.l_linestatus.values, N_LI), pa.string()),
    "l_shipdate": pa.array((ship // 1000).astype("int64"), pa.timestamp("us")),
})
write("lineitem", lineitem)

# ---- events: increasing timestamps over the same window, 10x users ----
ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
N_EV = int(1_000_000 * M)
span = ev.ts.max().value - ev.ts.min().value
ts = np.sort(rng.integers(0, span, N_EV)) + ev.ts.min().value
events = pa.table({
    "event_id": pa.array(np.arange(N_EV), pa.int64()),
    "ts": pa.array((ts // 1000).astype("int64"), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, int(15000 * M), N_EV), pa.int64()),
    "event_type": pa.array(sample(ev.event_type.values, N_EV), pa.string()),
    "value": pa.array(np.round(rng.uniform(0.0, ev.value.max(), N_EV), 2),
                      pa.float64()),
    "props": pa.array([json.dumps({"k": int(k)})
                       for k in rng.integers(0, 100, N_EV)], pa.string()),
})
write("events", events)
print("done ->", DST)
