"""Objects365 pretraining entrypoint (parity: reference
tools/train_objects365_detection_model.py:264 — save every epoch, no eval)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import detection


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    config.test_dataset = None  # no per-epoch eval; latest.ckpt every epoch
    Trainer(config, args.work_dir,
            make_loss_fn=detection.make_loss_fn).run()


if __name__ == "__main__":
    main()
