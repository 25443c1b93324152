"""MMDiT diffusion training CLI.

Behavioral reference: scripts/diffusion/train.py:83-649 — config parse,
bucketized dataloader, model/AE/text builds, rectified-flow loss with
conditioning dropout + visual conditions, EMA, checkpoint/resume,
logging/timers.

TPU design: one jitted train step over the full mesh per bucket shape
(TP+FSDP+SP shardings in parallel/sharding.py); VAE/text encoding runs as
separate jitted calls per bucket shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _fit_null_txt(null_txt, txt_len: int):
    """Cut or last-token-pad the null text embedding to ``txt_len`` rows
    (reference scripts/diffusion/train.py:415-420)."""
    import jax.numpy as jnp

    if null_txt.shape[1] >= txt_len:
        return null_txt[:, :txt_len]
    pad = jnp.repeat(null_txt[:, -1:], txt_len - null_txt.shape[1], axis=1)
    return jnp.concatenate([null_txt, pad], axis=1)


def main():
    import jax
    import jax.numpy as jnp

    from opensora_tpu.datasets.dataloader import prepare_dataloader
    from opensora_tpu.parallel.context import set_mesh
    from opensora_tpu.parallel.data import make_global_batch
    from opensora_tpu.parallel.mesh import MeshConfig, create_mesh
    from opensora_tpu.parallel.sharding import make_shardings, mmdit_param_specs
    from opensora_tpu.registry import DATASETS, MODELS, build_module
    from opensora_tpu.training.diffusion import (
        TrainState,
        compute_shift_alpha,
        jit_train_step,
        make_train_step,
        shard_state,
    )
    from opensora_tpu.utils.ckpt import CheckpointIO
    from opensora_tpu.utils.config import (
        create_experiment_workspace,
        parse_configs,
    )
    from opensora_tpu.utils.logger import create_logger
    from opensora_tpu.utils.misc import Timers, count_params, format_numel, log_device_memory
    from opensora_tpu.utils.optimizer import create_optimizer
    from opensora_tpu.utils.tb import MetricsWriter
    from opensora_tpu.utils.sampling import build_img_ids, pack, prepare, prepare_ids
    from opensora_tpu.utils.train import build_visual_condition, choose_mask_conditions
    import opensora_tpu.models.mmdit  # noqa: F401
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.dc_ae  # noqa: F401
    import opensora_tpu.models.text.conditioner  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    cfg = parse_configs()
    if cfg.get("multi_host", False):
        # multi-host pods: one process per host over DCN (the analogue of
        # torchrun + dist.init_process_group, reference utils/train.py:56-70)
        jax.distributed.initialize()
    exp_dir = create_experiment_workspace(cfg)
    logger = create_logger(exp_dir)
    logger.info("experiment dir: %s", exp_dir)

    # opt-in pipeline parallelism (reference HybridParallelPlugin pp_size,
    # scripts/diffusion/train.py:442-458): a (data, pp[, tp]) mesh replaces
    # the default (data, sp, tp) GSPMD mesh; block stacks shard over 'pp'
    # (features also over 'tp' when tp_size > 1 — the reference's tp×pp
    # hybrid) and the forward runs the GPipe schedule (training/pp.py).
    # GSPMD is the default.
    pp_cfg = cfg.get("pipeline")
    if pp_cfg:
        from opensora_tpu.training.pp import (
            create_pp_mesh,
            make_pp_forward,
            pp_state_shardings,
        )

        pp_size = pp_cfg["pp_size"]
        tp_size = pp_cfg.get("tp_size", 1)  # PP×TP hybrid (training/pp.py)
        data_size = pp_cfg.get("data_size") or jax.device_count() // (
            pp_size * tp_size
        )
        mesh = create_pp_mesh(pp=pp_size, data=data_size, tp=tp_size)
    else:
        mesh = create_mesh(MeshConfig(**cfg.get("mesh", {})))
    set_mesh(mesh)
    logger.info("mesh: %s", mesh)

    # ---- data ----
    dataset = build_module(dict(cfg.dataset), DATASETS)
    dataloader, sampler = prepare_dataloader(
        dataset,
        bucket_config=cfg.get("bucket_config"),
        batch_size=cfg.get("batch_size"),
        num_workers=cfg.get("num_workers", 2),
        seed=cfg.get("seed", 42),
    )

    # ---- models ----
    model = build_module(dict(cfg.model), MODELS)
    model_ae = build_module(dict(cfg.ae), MODELS)
    model_t5 = build_module(dict(cfg.t5), MODELS)
    model_clip = build_module(dict(cfg.clip), MODELS)

    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    patch_size = cfg.get("patch_size", 2)
    mcfg = model.config

    # init params on a representative tiny shape (shape-polymorphic weights);
    # in-model sharding constraints need batch/tokens divisible by the mesh
    B0 = mesh.shape["data"]
    sp0 = mesh.shape.get("sp", 1)  # absent on the (data, pp) pipeline mesh
    L0 = 16 * sp0
    Lt0 = 8 * sp0
    init_args = (
        jnp.zeros((B0, L0, mcfg.in_channels), jnp.float32),
        jnp.zeros((B0, L0, 3)),
        jnp.zeros((B0, Lt0, mcfg.context_in_dim), jnp.float32),
        jnp.zeros((B0, Lt0, 3)),
        jnp.zeros((B0,)),
        jnp.zeros((B0, mcfg.vec_in_dim), jnp.float32),
        jnp.zeros((B0, L0, mcfg.in_channels + patch_size**2), jnp.float32)
        if mcfg.cond_embed else None,
        jnp.zeros((B0,)) if mcfg.guidance_embed else None,
    )
    if mcfg.from_pretrained:
        # finetune from a published torch checkpoint (reference
        # scripts/diffusion/train.py:191-235, utils/ckpt.py:84-140); the
        # random-init template supplies target shapes/dtypes and catches
        # converter/geometry mismatches before the first step
        from opensora_tpu.utils.ckpt import load_checkpoint

        template = jax.eval_shape(model.init, rng, *init_args)["params"]
        loaded = load_checkpoint(model, mcfg.from_pretrained, kind="mmdit")["params"]

        def cast(t, p):
            assert t.shape == p.shape, f"shape mismatch {t.shape} vs {p.shape}"
            return jnp.asarray(p, t.dtype)

        params = jax.tree.map(cast, template, loaded)
        logger.info("loaded pretrained MMDiT weights from %s", mcfg.from_pretrained)
    else:
        params = model.init(rng, *init_args)["params"]
    logger.info("MMDiT params: %s", format_numel(count_params(params)))
    if pp_cfg:
        from jax.sharding import NamedSharding

        from opensora_tpu.training.pp import pp_param_specs

        param_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), pp_param_specs(params)
        )
    else:
        param_shardings = make_shardings(mesh, mmdit_param_specs(params, fsdp=True))
    params = jax.device_put(params, param_shardings)

    # LoRA fine-tuning (reference train.py:198-217, peft LoraConfig): the
    # optimizer/EMA/train-state hold only the (A, B) factor tree; the loaded
    # base params stay frozen and are merged on the fly in the loss
    lora_cfg = cfg.get("lora_config")
    base_params = None
    lora_scale = 1.0
    if lora_cfg:
        from opensora_tpu.training.lora import (
            DEFAULT_TARGETS,
            count_lora_params,
            init_lora_params,
        )

        rank = lora_cfg.get("r", lora_cfg.get("rank", 16))
        lora_scale = lora_cfg.get("lora_alpha", rank) / rank  # peft semantics
        base_params = params
        rng, r_lora = jax.random.split(rng)
        params = init_lora_params(
            base_params, r_lora, rank=rank,
            target_regex=lora_cfg.get("target_regex", DEFAULT_TARGETS),
        )
        logger.info(
            "LoRA enabled: rank %d, scale %.3f, %s trainable factor params",
            rank, lora_scale, format_numel(count_lora_params(params)),
        )

    ae_vars = None
    if cfg.get("cached_video", False):
        ae_encode = None
    else:
        from opensora_tpu.utils.ckpt import init_ae_variables

        x0s = jnp.zeros((1, 3, 5, 64, 64), jnp.float32)
        ae_vars = init_ae_variables(model_ae, dict(cfg.ae), rng, x0s)
        if dict(cfg.ae).get("from_pretrained"):
            logger.info("loaded pretrained AE weights from %s", cfg.ae["from_pretrained"])
        ae_encode = jax.jit(
            lambda x, r: model_ae.apply(
                ae_vars, x, rngs={"gaussian": r}, method=type(model_ae).encode
            )
        )

    # ---- optimizer / state ----
    tx = create_optimizer(
        lr=cfg.get("lr", 1e-4),
        weight_decay=cfg.get("weight_decay", 0.0),
        eps=cfg.get("adam_eps", 1e-8),
        warmup_steps=cfg.get("warmup_steps"),
        grad_clip=cfg.get("grad_clip"),
        accumulation_steps=cfg.get("accumulation_steps", 1),
    )
    # no EMA under LoRA (reference train.py:198-205: EMA only without LoRA)
    use_ema = cfg.get("ema_decay", 0.9999) is not None and not lora_cfg
    state = TrainState.create(params, tx, ema=use_ema)
    st_shard = None
    if pp_cfg:
        if lora_cfg:
            raise NotImplementedError(
                "pipeline + lora_config is unsupported — LoRA finetuning "
                "fits without PP (factors are tiny); use the GSPMD mesh"
            )
        st_shard = pp_state_shardings(mesh, state)
        state = jax.device_put(state, st_shard)
    else:
        state, _ = shard_state(mesh, state, fsdp=True)
    log_device_memory("post-state", logger)

    train_step = make_train_step(
        model, tx,
        ema_decay=cfg.get("ema_decay", 0.9999),
        text_dropout_prob=cfg.get("dropout_ratio", {}).get("t5", 0.0)
        if cfg.get("dropout_ratio") else 0.0,
        use_masked_loss=cfg.get("condition_config") is not None,
        patch_size=patch_size,
        lora_scale=lora_scale,
        forward_fn=make_pp_forward(
            model, mesh, n_micro=pp_cfg.get("n_micro", 2 * pp_size)
        ) if pp_cfg else None,
    )
    step_fn = jit_train_step(
        train_step, mesh, state, fsdp=True,
        frozen_shardings=param_shardings if lora_cfg else None,
        st_shard=st_shard,
    )
    step_extra = (base_params,) if lora_cfg else ()

    ckpt_io = CheckpointIO()
    start_epoch = start_step = global_step = 0
    if cfg.get("load"):
        state, running, sampler_state = ckpt_io.load(cfg.load, state)
        start_epoch, start_step = running["epoch"], running["step"]
        global_step = running["global_step"]
        if sampler_state and hasattr(sampler, "load_state_dict"):
            sampler.load_state_dict(sampler_state)
        logger.info("resumed at epoch %d step %d", start_epoch, start_step)

    # pre-compile the AE over every bucket shape (reference warmup_ae,
    # utils/train.py:453-459) so the first epoch pays no compile stalls
    if cfg.get("warmup_ae", False) and ae_encode is not None:
        from opensora_tpu.datasets.aspect import bucket_to_shapes

        for shape in bucket_to_shapes(cfg.bucket_config, batch_size=1):
            rng, r = jax.random.split(rng)
            ae_encode(jnp.zeros(shape, jnp.float32), r)
            logger.info("warmed AE for %s", shape)

    # null embeddings for CFG dropout
    null_txt = np.asarray(model_t5([""]))
    null_vec = np.asarray(model_clip([""]))

    timers = Timers()
    writer = MetricsWriter(exp_dir, use_wandb=cfg.get("wandb", False), config=cfg.to_dict())
    seq_align = cfg.get("seq_align", 1)
    condition_config = cfg.get("condition_config")
    host_rng = np.random.default_rng(cfg.get("seed", 42))

    num_steps_per_epoch = len(dataloader)
    total_epochs = cfg.get("epochs", 1)
    log_every = cfg.get("log_every", 1)
    ckpt_every = cfg.get("ckpt_every", 1000)

    for epoch in range(start_epoch, total_epochs):
        sampler.set_epoch(epoch)
        for step, batch in enumerate(dataloader, start=start_step):
            with timers("encode_video"):
                rng, r_ae = jax.random.split(rng)
                if cfg.get("cached_video", False):
                    # precomputed latents + text embeddings
                    # (reference train.py:380,393 cached paths)
                    x0_lat = jnp.asarray(batch["video_latents"])
                    masks = cond_packed = None
                    inp = prepare_ids(
                        x0_lat,
                        jnp.asarray(batch["text_t5"]),
                        jnp.asarray(batch["text_clip"]),
                    )
                    cached = True
                else:
                    cached = False
                    x = jnp.asarray(batch["video"])
                if not cached and condition_config is not None:
                    latent = ae_encode(x, r_ae)
                    lt = latent.shape[2]
                    mask_conds = choose_mask_conditions(
                        dict(condition_config), x.shape[0], lt,
                        model_ae.config.time_compression_ratio, host_rng,
                    )
                    enc1 = lambda xi: ae_encode(xi, r_ae)
                    masks, cond = build_visual_condition(
                        x, mask_conds, enc1, latent,
                        model_ae.config.time_compression_ratio,
                    )
                    cond_packed = pack(cond, patch_size=patch_size)
                    x0_lat = latent
                elif not cached:
                    x0_lat = ae_encode(x, r_ae)
                    masks = cond_packed = None

            with timers("encode_text"):
                if not cached:
                    inp = prepare(
                        model_t5, model_clip, x0_lat, prompt=batch["text"],
                        seq_align=seq_align, patch_size=patch_size,
                    )

            lt, lh, lw = x0_lat.shape[2], x0_lat.shape[3], x0_lat.shape[4]
            shift_alpha = compute_shift_alpha(lh, lw, lt)
            bsz = x0_lat.shape[0]
            tb = {
                "x0": inp["img"],
                "img_ids": inp["img_ids"],
                "txt": inp["txt"],
                "txt_ids": inp["txt_ids"],
                "y_vec": inp["y_vec"],
                "cond": cond_packed,
                "masks": masks,
                "guidance": jnp.full((bsz,), cfg.get("guidance", 4.0), jnp.float32),
                "shift_alpha": jnp.full((bsz,), shift_alpha, jnp.float32),
                # null embedding cut/padded to the (seq_align-padded) txt
                # length — pad repeats the LAST null token, matching the
                # reference (scripts/diffusion/train.py:415-420), not zeros
                "null_txt": jnp.broadcast_to(
                    _fit_null_txt(jnp.asarray(null_txt), inp["txt"].shape[1]),
                    inp["txt"].shape,
                ),
                "null_vec": jnp.broadcast_to(jnp.asarray(null_vec), inp["y_vec"].shape),
            }
            # explicit mesh placement: rows on 'data', tokens on 'sp'; on
            # multi-host pods this assembles the global batch from each
            # host's local rows (parallel/data.py, SURVEY §2.6 DP row)
            tb = make_global_batch(mesh, tb)

            prof = cfg.get("profile")  # dict(start=, end=) global steps
            if prof and global_step == prof.get("start", -1):
                jax.profiler.start_trace(os.path.join(exp_dir, "profile"))
            with timers("step"):
                rng, r_step = jax.random.split(rng)
                state, metrics = step_fn(state, tb, r_step, *step_extra)
            global_step += 1
            if prof and global_step == prof.get("end", -1):
                jax.profiler.stop_trace()
                logger.info("profile written to %s/profile", exp_dir)

            if global_step % log_every == 0:
                loss = float(metrics["loss"])
                tdict = timers.to_dict()
                logger.info(
                    "epoch %d step %d/%d loss %.4f grad_norm %.3f %s",
                    epoch, step, num_steps_per_epoch, loss,
                    float(metrics["grad_norm"]), tdict,
                )
                writer.log(
                    {"loss": loss, "grad_norm": float(metrics["grad_norm"]), **tdict},
                    global_step,
                )
            if global_step % ckpt_every == 0:
                with timers("checkpoint"):
                    d = ckpt_io.save(
                        exp_dir, state, epoch, step, global_step,
                        sampler_state=sampler.state_dict(step)
                        if hasattr(sampler, "state_dict") else None,
                        keep_n_latest=cfg.get("keep_n_latest", -1),
                    )
                logger.info("checkpoint saved to %s", d)
        start_step = 0

    ckpt_io.save(exp_dir, state, total_epochs - 1, num_steps_per_epoch, global_step)
    ckpt_io.wait()
    writer.close()
    logger.info("training done")


if __name__ == "__main__":
    main()
