#!/usr/bin/env python3
"""Per-query bench regression check, medians-to-medians (dev helper).

Usage: python3 tools/bench_diff.py BENCH_r12.json BENCH_r13.json [pct]

Both files must carry the round-12+ median-of-3 methodology
("method":"median3") — comparing a median file against a pre-r12
min-of-reruns file is flagged and refused, because the uniform
median-vs-min inflation (~10-20%) would read as a fleet-wide
regression.

Flags queries whose median moved more than `pct` (default 30%) AND
moved outside the union of both rounds' spreads (a mover inside
spread is host noise, not code). Streaming gates whose "first"
(boot-inclusive) timing is reported separately are compared on the
median (steady state); the boot delta prints informationally.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                d = json.loads(line)
                if d.get("queries"):
                    return d
    raise SystemExit(f"no full bench line in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    for d, p in ((old, sys.argv[1]), (new, sys.argv[2])):
        if d.get("method") != "median3":
            raise SystemExit(
                f"{p} is not median-of-3 (method={d.get('method')!r}); "
                "medians-to-medians only")
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spread", {}), new.get("spread", {})
    fn = new.get("first", {})
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    movers = []
    for q in common:
        a, b = qo[q], qn[q]
        if a <= 0:
            continue
        delta = b - a
        rel = delta / a * 100
        # absolute-delta floor (round-17 verdict item 5): a ratio test
        # alone keeps flagging sub-0.4 s gates whose job floor swings
        # tens of ms. When BOTH rounds carry measured spread for the
        # gate (median-sampled — r18 samples everything >0.15 s, with
        # median-5 below 1 s), the floor relaxes to 0.10 s and the
        # real spread dominates: a seeded 0.30→0.45 s regression
        # (delta 0.15) flags, while a 0.21→0.31 s jitter move (delta
        # 0.10) stays under it. With no spread data the conservative
        # 0.15 s floor stands.
        floor = 0.10 if (q in so and q in sn) else 0.15
        tol = max(so.get(q, 0.0), sn.get(q, 0.0), floor)
        if abs(rel) > pct and abs(delta) > tol:
            movers.append((rel, q, a, b, tol))
    movers.sort(key=lambda t: -abs(t[0]))
    print(f"common {len(common)}  added {len(added)}  removed {len(removed)}")
    print(f"common-query sums: old {sum(qo[q] for q in common):.1f} s  "
          f"new {sum(qn[q] for q in common):.1f} s")
    if added:
        print(f"added: {', '.join(f'{q} ({qn[q]:.2f}s)' for q in added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    if not movers:
        print(f"no movers beyond ±{pct:.0f}% outside spread")
    for rel, q, a, b, tol in movers:
        boot = f"  boot(first)={fn[q]:.2f}s" if q in fn else ""
        print(f"MOVER {rel:+7.1f}%  {q:26s} {a:6.2f} -> {b:6.2f} s "
              f"(spread tol {tol:.2f}){boot}")
    steadies = {q: v for q, v in fn.items() if q in qn}
    if steadies:
        print("\nboot-vs-steady (streaming/memoized gates):")
        for q in sorted(steadies):
            print(f"  {q:26s} first {steadies[q]:6.2f} s   "
                  f"median {qn[q]:6.2f} s")
    # round-17+: the memo-off stream pass is the tracked steady-state
    # series for stream gates (their medians are memoized block reads
    # since r16) — diff it like-for-like when both rounds carry it,
    # flagging >1.3x movers per the round-16 verdict ask
    mo_old, mo_new = old.get("stream_memooff", {}), new.get(
        "stream_memooff", {})
    mo_common = sorted(set(mo_old) & set(mo_new))
    # r18+: stream gates are checkpoint-I/O bound — surface the tmp-I/O
    # probe next to the stream diff so "the box's disk slowed" is
    # readable from the artifact (observed: 1.5-2x stream drift at 0.4%
    # steal, CPU clean, I/O contended)
    io_old, io_new = old.get("io_probe_ms"), new.get("io_probe_ms")
    if io_old or io_new:
        def fmt(d):
            if not d:
                return "n/a"
            parts = [f"{k} {v:.1f} ms" for k, v in d.items()]
            return ", ".join(parts)
        print(f"\ntmp-I/O probe: old [{fmt(io_old)}]  new [{fmt(io_new)}]"
              "  (stream gates are checkpoint-I/O bound — a probe shift"
              " explains a board-wide stream move)")
    if mo_common:
        print("\nstream memo-off (steady-state) movers >1.3x:")
        any_mover = False
        for q in mo_common:
            a, b = mo_old[q], mo_new[q]
            if a > 0 and (b / a > 1.3 or a / b > 1.3) and abs(b - a) > 0.3:
                print(f"  STREAM-MOVER {q:26s} {a:6.2f} -> {b:6.2f} s "
                      f"({b / a:4.2f}x)")
                any_mover = True
        if not any_mover:
            print("  none")
        print(f"  memo-off sums: old {sum(mo_old[q] for q in mo_common):.1f} s"
              f"  new {sum(mo_new[q] for q in mo_common):.1f} s"
              f"  ({len(mo_common)} gates)")
    elif mo_new:
        print(f"\nstream memo-off: new series present ({len(mo_new)} gates,"
              f" {sum(mo_new.values()):.1f} s) — no old series to diff")


if __name__ == "__main__":
    main()
