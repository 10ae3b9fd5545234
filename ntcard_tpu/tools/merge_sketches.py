"""Merge saved sketch checkpoints and emit histograms.

    python -m ntcard_tpu.tools.merge_sketches -p prefix [-c cov] s1.npz s2.npz ...

Because the count-table fold is commutative, merging per-shard / per-machine
partial sketches is bit-identical to one combined run — the offline analog of
the in-job mesh merge (parallel/data_parallel.py). The reference has no
checkpointing (SURVEY.md §5); this is a capability extension enabled by the
pure-state design.
"""

from __future__ import annotations

import getopt
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    args_in = sys.argv[1:] if argv is None else argv
    prefix, output, cov_max = "", "", 1000
    try:
        optlist, args = getopt.gnu_getopt(args_in, "p:o:c:", ["pref=", "output=", "cov="])
    except getopt.GetoptError as e:
        sys.stderr.write(f"merge_sketches: {e}\n")
        return 1
    for flag, val in optlist:
        if flag in ("-p", "--pref"):
            prefix = val
        elif flag in ("-o", "--output"):
            output = val
        elif flag in ("-c", "--cov"):
            cov_max = min(int(val), 65535)
    if not args or not (prefix or output):
        sys.stderr.write(
            "usage: merge_sketches -p PREFIX|-o FILE [-c COV] SKETCH.npz...\n"
        )
        return 1

    from ntcard_tpu.models.estimate import comp_est_hist
    from ntcard_tpu.models.sketch import CountTableSketch
    from ntcard_tpu.output import write_compact, write_default

    merged = CountTableSketch.load(args[0])
    for path in args[1:]:
        merged.merge_(CountTableSketch.load(path))
    state = merged.finalize()

    results = {}
    for k in merged.ks:
        f0, f = comp_est_hist(state[k]["hist"], merged.s_bits, merged.r_bits, cov_max)
        results[k] = {"f1": state[k]["f1"], "f0": f0, "f": f}
    if output:
        write_compact(output, merged.ks, results, cov_max)
    else:
        write_default(prefix, merged.ks, results, cov_max)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
