"""SAM-matting training entrypoint (parity: reference
tools/train_interactive_matting_model.py + interactive_matting_scripts.py:314
— SAM backbone + matting heads, global/local/fusion loss stack routed like
human matting, point/box prompts from the SAM collater)."""

import jax
import jax.numpy as jnp

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer


def make_loss_fn(model, criterion_cfg):
    """criterion_cfg: dict name -> (ratio, loss) — same routing as
    tasks.matting but the model forward takes (image, prompts, train) and
    the mask/alpha comes back at the SAM mask resolution (input/4)."""

    def loss_fn(params, state_vars, batch, rng, train):
        variables = {"params": params, **state_vars}
        mutable = [k for k in state_vars] if train else False
        rngs = {"dropout": rng}
        prompts = {"prompt_point": batch.get("prompt_point"),
                   "prompt_box": batch.get("prompt_box"),
                   "prompt_mask": None}
        if train and mutable:
            (g, l, fused, _), new_vars = model.apply(
                variables, batch["image"], prompts, train, rngs=rngs,
                mutable=mutable)
        else:
            g, l, fused, _ = model.apply(variables, batch["image"], prompts,
                                         train, rngs=rngs)
            new_vars = state_vars
        # gt alpha/trimap at input res -> subsample to the head resolution
        f = batch["alpha"].shape[-1] // g.shape[1]
        alpha = batch["alpha"][:, ::f, ::f]
        trimap = batch["trimap"][:, ::f, ::f]
        total = jnp.zeros((), jnp.float32)
        metrics = {}
        for name, (ratio, loss) in criterion_cfg.items():
            if name.startswith(("Global", "Gloabel")):
                v = loss(g, trimap)
            elif name.startswith("Local"):
                v = loss(l, alpha, trimap)
            elif name.startswith("Composition"):
                image = batch["image"][:, ::f, ::f]
                v = loss(fused, alpha, image)
            else:  # Fusion*
                v = loss(fused, alpha)
            metrics[name] = v
            total = total + ratio * v
        return total, (metrics, new_vars)

    return loss_fn


class SAMMattingTrainer(Trainer):

    def _init_variables(self, model, rng, init_batch):
        s = self.config.input_image_size
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
        make_loss_fn=lambda model, _c: make_loss_fn(model,
                                                    config.criterion_cfg),
        init_batch=init_batch).run()


if __name__ == "__main__":
    main()
