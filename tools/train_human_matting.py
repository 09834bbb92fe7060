"""Human-matting training entrypoint (parity: reference
tools/train_human_matting_model.py)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import matting


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    trainer = Trainer(
        config, args.work_dir,
        make_loss_fn=lambda model, _c: matting.make_loss_fn(
            model, config.criterion_cfg),
        make_eval_fn=matting.make_eval_fn,
        evaluate=matting.make_evaluate())
    trainer.run()


if __name__ == "__main__":
    main()
