#!/usr/bin/env python3
"""Replica-0 substitute checks for `dedup_simhash` and `doc_chunk_cdc`
at synthetic scales where the DuckDB oracle is infeasible on this host
(dedup_simhash's candidate pipeline spills >60 GB; doc_chunk_cdc's
string_agg reassembly exceeds a 90 GB memory limit un-spillably).

ScaleUp keeps replica 0 byte-identical to the source SF, and both
queries are decided by doc-id-local rules, so the synthetic output
restricted to replica-0 keys must equal the ORACLE-VERIFIED source-SF
output exactly:

- dedup_simhash (doc_a, doc_b, hamming): the signature is a pure
  per-document function of text; candidacy (pigeonhole block
  equality) and the verify (hamming <= k) are pair-local. Pairs with
  BOTH endpoints in replica 0 therefore depend on replica-0 text
  alone == the source-SF pair set.
- doc_chunk_cdc (doc_id, chunk_id, n_chunk_tokens, chunk_text):
  chunk boundaries are per-document (rolling-hash cut rule), so these
  four columns restricted to replica-0 docs equal the source SF. The
  fifth column, n_docs_sharing, counts sharers ACROSS replicas (CDC
  re-synchronizes after the per-replica prefix edit, so replicas DO
  share chunk text with replica 0) — it is instead checked by an
  independent full-output recount: group the synthetic output by
  chunk_text and require COUNT(DISTINCT doc_id) to equal every row's
  n_docs_sharing.

The cross-replica interaction these subset checks cannot see is
covered by the full DuckDB oracle replay at sf1 (10 replicas,
CORRECTNESS_sf1.json).

Usage: replica0_check.py <query> <src_out> <syn_out> [K=100000000]
"""
import glob
import sys

import pandas as pd

query, src_out, syn_out = sys.argv[1], sys.argv[2], sys.argv[3]
K = int(sys.argv[4]) if len(sys.argv) > 4 else 100000000


def load(d, q):
    return pd.concat([pd.read_parquet(f)
                      for f in sorted(glob.glob(f"{d}/{q}/*.parquet"))])


src = load(src_out, query)
syn = load(syn_out, query)

if query in ("dedup_simhash", "dedup_minhash_lsh"):
    # both are pair-local: signature = pure per-doc function of text,
    # candidacy = bucket/block equality of the two signatures, verify
    # (hamming / jaccard) = function of the two docs — so pairs with
    # both endpoints in replica 0 depend on replica-0 text alone
    metric = "hamming" if query == "dedup_simhash" else "jaccard"
    sub = syn[(syn.doc_a < K) & (syn.doc_b < K)]
    a = sorted(map(tuple, sub[["doc_a", "doc_b", metric]]
                   .itertuples(index=False, name=None)))
    e = sorted(map(tuple, src[["doc_a", "doc_b", metric]]
                   .itertuples(index=False, name=None)))
    if a != e:
        print(f"FAIL {query}: replica-0 pairs {len(a)} != source {len(e)}")
        sys.exit(1)
    print(f"OK   {query} (replica-0 block {len(a)} rows exact-equal "
          f"to oracle-verified source SF; {len(syn)} total rows)")
elif query == "doc_chunk_cdc":
    cols = ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]
    sub = syn[syn.doc_id < K]
    a = sorted(map(tuple, sub[cols].itertuples(index=False, name=None)))
    e = sorted(map(tuple, src[cols].itertuples(index=False, name=None)))
    if a != e:
        print(f"FAIL doc_chunk_cdc: replica-0 chunks {len(a)} != source {len(e)}")
        sys.exit(1)
    # replica-0 n_docs_sharing counts cross-replica sharers — recount
    # independently over the full synthetic output
    recount = syn.groupby("chunk_text")["doc_id"].nunique()
    bad = syn[syn["n_docs_sharing"].to_numpy()
              != recount[syn["chunk_text"]].to_numpy()]
    if len(bad):
        print(f"FAIL doc_chunk_cdc: {len(bad)} rows with inconsistent "
              f"n_docs_sharing, e.g.\n{bad.head(3)}")
        sys.exit(1)
    print(f"OK   doc_chunk_cdc (replica-0 block {len(a)} rows exact-equal; "
          f"n_docs_sharing recount consistent on all {len(syn)} rows)")
else:
    sys.exit(f"unknown query {query}")
