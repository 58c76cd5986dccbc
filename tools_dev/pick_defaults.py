"""Rank tools_dev/sweep_bench.py results from a phase-1 log.

    python tools_dev/pick_defaults.py /tmp/tpu_phase1.log

Parses the per-mode lines, ranks by us/cell-iter (the dispatch-size-
independent metric), checks the radiance means agree (a wrong kernel is
worse than a slow one), and prints the KernelOptions mapping of the
winner so step 2 of the runbook is mechanical.
"""
import re
import sys

LINE = re.compile(
    r"^(\S+)\s+compile\s+([\d.]+)s \|\s*([\d.]+) ms/dispatch"
    r" \|\s*([\d.]+) M ray-bounces/s \|\s*([\d.]+) us/cell-iter"
    r" \| mean ([\d.]+)")


def main(path):
    rows = []
    for ln in open(path):
        m = LINE.match(ln.strip())
        if m:
            mode, comp, ms, mrb, us, mean = m.groups()
            rows.append((float(us), mode, float(mrb), float(ms),
                         float(comp), float(mean)))
    if not rows:
        print("no sweep_bench lines found in", path)
        return 1
    means = sorted(r[5] for r in rows)
    ref = means[len(means) // 2]
    print(f"{'us/cell-iter':>12s}  {'mode':16s} {'Mray-b/s':>9s} "
          f"{'ms/disp':>8s} {'compile':>8s}  mean-ok")
    for us, mode, mrb, ms, comp, mean in sorted(rows):
        ok = "OK" if abs(mean - ref) <= 5e-4 * max(ref, 1e-9) else "MISMATCH"
        print(f"{us:12.2f}  {mode:16s} {mrb:9.1f} {ms:8.2f} {comp:8.1f}  {ok}")
    best = min(r for r in rows
               if abs(r[5] - ref) <= 5e-4 * max(ref, 1e-9))
    print(f"\nwinner: {best[1]}  ({best[0]:.2f} us/cell-iter, "
          f"{best[2]:.1f} M ray-bounces/s)")
    print("map to KernelOptions via tools_dev/sweep_bench.ENV_FOR_MODE"
          f"[{best[1]!r}] -> box/balance/cull_every/schedule/rounds_unroll")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_phase1.log"))
