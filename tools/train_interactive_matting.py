"""SAM-matting training entrypoint (parity: reference
tools/train_interactive_matting_model.py + interactive_matting_scripts.py:314
— SAM/LightSAM backbone + fusion matting heads, SAMMatting*Loss stacks,
point/box prompts from the SAM collater, per-epoch SAD/MAE/MSE validation
matching interactive_matting_scripts.py MattingEvalMeter:18)."""

import jax
import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def _forward(model, params, state_vars, batch, rng, train):
    variables = {"params": params, **state_vars}
    mutable = [k for k in state_vars] if train else False
    prompts = {"prompt_point": batch.get("prompt_point"),
               "prompt_box": batch.get("prompt_box"),
               "prompt_mask": None}
    if train and mutable:
        return model.apply(variables, batch["image"], prompts, train,
                           rngs={"dropout": rng}, mutable=mutable)
    out = model.apply(variables, batch["image"], prompts, train,
                      rngs={"dropout": rng})
    return out, state_vars


def make_loss_fn(model, criterion):
    """criterion: a SAMMatting{OneLevel,MultiLevel,...}Loss. fg/bg maps are
    computed on device from image*alpha (reference
    sam_matting_dataset.py:415-421) instead of shipping two extra full-res
    host arrays per sample."""

    def loss_fn(params, state_vars, batch, rng, train):
        (g, l, fused, iou), new_vars = _forward(model, params, state_vars,
                                                batch, rng, train)
        image = batch["image"].astype(jnp.float32)
        alpha = batch["alpha"].astype(jnp.float32)
        fg_map = image * alpha[..., None]
        bg_map = image * (1.0 - alpha[..., None])
        loss_dict = criterion(image, (g, l, fused, iou),
                              (alpha, batch["trimap"], fg_map, bg_map))
        total = sum(loss_dict.values())
        return total, (loss_dict, new_vars)

    return loss_fn


def make_eval_fn(model):
    """SAD/MAE/MSE sums on the fused alpha (reference MattingEvalMeter:18).
    Multi-level models are evaluated on the max-predicted-iou level."""

    def eval_fn(params, state_vars, batch, rng, train):
        del train
        (g, l, fused, iou), _ = _forward(model, params, state_vars, batch,
                                         rng, False)
        if fused.ndim == 5:  # [b,L,h,w,1] -> best predicted level
            sel = jnp.argmax(iou, axis=1)
            fused = jnp.take_along_axis(
                fused, sel[:, None, None, None, None], axis=1)[:, 0]
        pred = fused[..., 0].astype(jnp.float32)
        alpha = batch["alpha"].astype(jnp.float32)
        diff = pred - alpha
        return {
            "sad_sum": jnp.sum(jnp.abs(diff)) / 1000.0,
            "mae_sum": jnp.sum(jnp.mean(jnp.abs(diff), axis=(1, 2))),
            "mse_sum": jnp.sum(jnp.mean(diff**2, axis=(1, 2))),
            "n": jnp.asarray(pred.shape[0], jnp.float32),
        }

    return eval_fn


def evaluate(eval_step, params, state_vars, loader, shard_fn):
    sad = mae = mse = n = 0.0
    for batch in loader:
        m = eval_step(params, state_vars, shard_fn(batch),
                      jax.random.PRNGKey(0))
        sad += float(m["sad_sum"])
        mae += float(m["mae_sum"])
        mse += float(m["mse_sum"])
        n += float(m["n"])
    n = max(n, 1.0)
    return {"sad": sad / n, "mae": mae / n, "mse": mse / n,
            "key_metric": -sad / n}


class SAMMattingTrainer(Trainer):

    def _init_variables(self, model, rng, init_batch):
        prompts = {
            "prompt_point": jnp.full((2, 9, 3), -1.0),
            "prompt_box": jnp.zeros((2, 4)),
            "prompt_mask": None,
        }

        @jax.jit
        def _init(r, image, pr):
            return model.init({"params": r, "dropout": r}, image, pr, True)
        return _init(rng, init_batch["image"], prompts)


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    s = config.input_image_size
    init_batch = {"image": jnp.zeros((2, s, s, 3), jnp.float32)}
    SAMMattingTrainer(
        config, args.work_dir,
        make_loss_fn=make_loss_fn,
        make_eval_fn=make_eval_fn,
        evaluate=evaluate,
        init_batch=init_batch).run()


if __name__ == "__main__":
    main()
