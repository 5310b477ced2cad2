"""Pack per-frame JPEG directories into `.cfnpack` containers.

One indexed container per video replaces thousands of per-frame file opens
with one open + seeks — the dominant host-side cost of the reference's frame
layout (``charades_fine.py:47-57``) on networked filesystems.  Point the
drivers at the output with ``DriverConfig(pack_dir=...)`` (JPEG fallback is
automatic for unpacked videos).

    python -m coarse_fine_networks_tpu.cli.pack_dataset \
        --root /data/Charades_frames --out /data/Charades_packs
"""

from __future__ import annotations

import argparse

from ..data import native


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="per-frame JPEG root")
    p.add_argument("--out", required=True, help="output .cfnpack directory")
    p.add_argument("--vids", nargs="*", default=None,
                   help="subset of video ids (default: every dir under root)")
    p.add_argument("--no-skip-existing", action="store_true")
    args = p.parse_args(argv)
    if not native.available():
        raise SystemExit("native library unavailable (g++ build failed?)")
    n = native.pack_directory(args.root, args.out, vids=args.vids,
                              skip_existing=not args.no_skip_existing)
    print(f"packed {n} videos -> {args.out}")


if __name__ == "__main__":
    main()
