"""MAE pretraining entrypoint (parity: reference
tools/train_mae_self_supervised_model.py — loss-only, best = lowest loss)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import mae


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    trainer = Trainer(config, args.work_dir, make_loss_fn=mae.make_loss_fn)
    trainer.run()


if __name__ == "__main__":
    main()
