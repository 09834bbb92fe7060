"""OCR text-recognition training entrypoint (parity: reference
tools/train_text_recognition_model.py + text_scripts.py:884)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import text_recognition as tr


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        return tr.evaluate_text_recognition(config.model, params, state_vars,
                                            loader, config.converter)

    trainer = Trainer(config, args.work_dir, make_loss_fn=tr.make_loss_fn)
    if getattr(config, "test_dataset", None) is not None:
        trainer.evaluate = evaluate
        trainer.eval_step = lambda *a, **k: None
    trainer.run()


if __name__ == "__main__":
    main()
