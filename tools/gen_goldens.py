#!/usr/bin/env python3
"""Regenerate the pinned golden VALUES oracles in EntryQueries.scala.

The four golden-pinned gate queries (u6_snippets, ann_lsh_topk,
dedup_minhash_lsh, embedding_near_dup) encode the engine's deterministic
output on the driver's FIXED sf0.01 corpus. If the corpus or a seed ever
changes, rerun:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vfy-out"
    python3 tools/gen_goldens.py /tmp/vfy-out

and paste the printed VALUES blocks over the corresponding ones in
src/main/scala/graft/entry/EntryQueries.scala. (Their SEMANTICS are
pinned separately by OpsSpec brute-force oracles; these literals only
freeze the concrete output for the driver's DuckDB hash check.)
"""
import sys
import pyarrow.parquet as pq

SPECS = {
    "ann_lsh_topk": (["vec_id", "sim"], ["i", "f"]),
    "dedup_minhash_lsh": (["d1", "d2", "jaccard"], ["i", "i", "f"]),
    "embedding_near_dup": (["v1", "v2", "sim"], ["i", "i", "f"]),
    "u6_snippets": (["doc_id", "score", "snippet"], ["i", "f", "s"]),
    # sfDir-independent (media synthesized): same VALUES at every sf
    "multimodal_signals": (
        ["media_id", "kind", "decoded", "width", "height", "duration_ms",
         "f0", "f1"],
        ["i", "s", "b", "i", "i", "i", "f", "f"]),
}


def fmt(v, ty):
    if ty == "i":
        return str(int(v))
    if ty == "f":
        return repr(float(v))
    if ty == "b":
        return "TRUE" if v else "FALSE"
    return "'" + str(v).replace("'", "''") + "'"


def main(out_dir):
    for name, (cols, types) in SPECS.items():
        t = pq.read_table(f"{out_dir}/{name}").to_pandas()
        print(f"-- {name} ({len(t)} rows)")
        for _, r in t.iterrows():
            vals = ", ".join(fmt(r[c], ty) for c, ty in zip(cols, types))
            print(f"      |  ({vals}),")
        print()


if __name__ == "__main__":
    main(sys.argv[1])
