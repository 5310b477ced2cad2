"""Checkpoint conversion CLI: reference torch ``.pt`` ↔ native ``.ckpt``.

    # torch → native
    python -m coarse_fine_networks_tpu.cli.convert_checkpoint \
        --input models/fine_charades_039000_SAVE.pt --model fine \
        --output models/fine_charades_039000.ckpt

    # native → torch state_dict (.pt)
    python -m coarse_fine_networks_tpu.cli.convert_checkpoint \
        --input models/fine_charades_001000.ckpt --model fine \
        --output exported.pt --to-torch
"""

from __future__ import annotations

import argparse

from ..ckpt import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model", default="fine", choices=["fine", "coarse"])
    p.add_argument("--to-torch", action="store_true",
                   help="export a native checkpoint to a torch state_dict")
    args = p.parse_args(argv)

    if args.to_torch:
        import torch

        raw = load_checkpoint(args.input)
        variables = raw.get("variables", raw)
        sd = export_torch_state_dict(variables["params"],
                                     variables["batch_stats"])
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
                   args.output)
    else:
        import torch

        ckpt = torch.load(args.input, map_location="cpu")
        sd = ckpt.get("model_state_dict", ckpt)
        conv = convert_torch_state_dict(sd, args.model)
        save_checkpoint(args.output, {"variables": conv, "step": 0,
                                      "scheduler": {"epoch": 0}})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
