"""One-process chip session: bench + per-stage profile + KLT microbench.

The first device<->host fetch over the tunneled chip pays a long
handshake that grows over the machine session, so all on-chip
measurements batch into ONE process. Run:
    timeout 4000 python tools/chip_session.py [bench|profile|klt]...
(defaults to all three, bench first).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    which = sys.argv[1:] or ["bench", "profile", "klt"]
    if "bench" in which:
        import bench as bench_mod
        print("=== bench ===", flush=True)
        bench_mod.main()
    if "profile" in which:
        print("=== profile_scan ===", flush=True)
        import importlib
        ps = importlib.import_module("tools.profile_scan")
        ps.main()
    if "klt" in which:
        print("=== klt_microbench ===", flush=True)
        import importlib
        km = importlib.import_module("tools.klt_microbench")
        km.main()


if __name__ == "__main__":
    main()
