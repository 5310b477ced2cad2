"""``python -m coarse_fine_networks_tpu.cli.pretrain_kinetics --root <jpegs>``

Kinetics-style pretraining of the Fine stream (``task='class'``) — produces
the checkpoint the reference assumes as its starting point
(``x3d_multigrid_kinetics_fb_pretrained.pt``, ``train_fine.py:104``); pass
the saved ``.ckpt`` as ``--kinetics-ckpt`` to the detection drivers.
"""

from .common import base_parser, to_config
from ..train import kinetics_driver


def main(argv=None):
    p = base_parser("Pretrain the Fine stream on a Kinetics-style corpus")
    p.add_argument("--classes", type=int, default=400)
    args = p.parse_args(argv)
    cfg = to_config(
        args,
        num_classes=args.classes,
        batch_size=args.batch_size or 32,
        init_lr=args.lr or 0.1,
        lr_milestones=(30, 60, 80),
        frames=16,
    )
    return kinetics_driver.run(cfg)


if __name__ == "__main__":
    main()
