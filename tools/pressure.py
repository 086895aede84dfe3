#!/usr/bin/env python3
"""Co-tenant pressure harness for bench-outlier reproduction.

Spawns N CPU spinners and one memory hog that allocates and
continuously re-touches `--mem-gb` of anonymous pages (evicting page
cache and stealing memory bandwidth), for `--secs` seconds. Used to
reproduce the r13 driver-window q_allpairs anomaly (32.8x first run /
58.2x retry under a FAST cpu canary) and record the signature the
bench instrument's run-vs-wall attribution assigns to it.

Usage: python3 tools/pressure.py --cpus 16 --mem-gb 60 --secs 300
"""
import argparse
import multiprocessing as mp
import os
import time


def spin(deadline: float) -> None:
    x = 0
    while time.time() < deadline:
        for i in range(100000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return None


def hog(gb: int, deadline: float) -> None:
    # 64 MiB chunks, touched on allocation and re-touched in a loop so
    # the pages stay resident and memory bandwidth is consumed
    chunk = 64 * 1024 * 1024
    chunks = []
    for _ in range(gb * 1024 // 64):
        if time.time() >= deadline:
            return
        buf = bytearray(chunk)
        for off in range(0, chunk, 4096):
            buf[off] = 1
        chunks.append(buf)
    while time.time() < deadline:
        for buf in chunks:
            for off in range(0, chunk, 4096):
                buf[off] = (buf[off] + 1) & 0xFF
            if time.time() >= deadline:
                return


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--mem-gb", type=int, default=60)
    ap.add_argument("--secs", type=int, default=300)
    args = ap.parse_args()
    deadline = time.time() + args.secs
    procs = [mp.Process(target=spin, args=(deadline,))
             for _ in range(args.cpus)]
    procs.append(mp.Process(target=hog, args=(args.mem_gb, deadline)))
    for p in procs:
        p.start()
    print(f"[pressure] pid={os.getpid()} cpus={args.cpus} "
          f"mem={args.mem_gb}GB for {args.secs}s")
    for p in procs:
        p.join()
    print("[pressure] done")


if __name__ == "__main__":
    main()
