"""Training / evaluation entry point.

Parity target: /root/reference/src/main.py:82-623 — argument parsing,
distributed init, experiment naming, model + EMA teacher construction,
optimizer with weight-decay split, schedulers, resume (incl. 'latest'
discovery and HF weights), the epoch loop with per-epoch checkpointing,
in-loop eval, and the eval-only dispatch modes.

TPU redesign: one process per HOST (not per device) driving all local
devices through the mesh; the teacher lives inside the TrainState pytree
(no deepcopy/DDP); the EMA update, clamps and schedules are fused into
the jitted step.

Usage:  python -m cosmos_tpu.training.main --model ViT-B-16 --cosmos ...
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)


def random_seed(seed: int = 42) -> None:
    import random

    random.seed(seed)
    np.random.seed(seed)


def experiment_name(args) -> str:
    """Auto-name from date/model/lr/batch (main.py:103-118)."""
    if args.name:
        return args.name
    date_str = datetime.datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    parts = [
        date_str,
        f"model_{args.model.replace('/', '-')}",
        f"lr_{args.lr}",
        f"b_{args.batch_size}",
    ]
    if getattr(args, "wandbkeyword", ""):
        parts.append(f"key_{args.wandbkeyword}")  # reference main.py:117
    return "-".join(parts)


def apply_pretrained_preprocess_flags(args) -> None:
    """Fill any --image-* flag the user left unset from the pretrained
    tag's registry preprocess cfg, so EVERY downstream transform consumer
    (eval_transform_from_args, the train transforms, TrainStepConfig's
    in-step normalization, zero-shot/retrieval eval) sees the
    checkpoint's own preprocessing — e.g. MobileCLIP's identity
    mean/std + bilinear.  Reference analog: factory.py:329-330
    merge_preprocess_dict runs on its main path because the reference
    main.py calls create_model_and_transforms; this trainer builds
    transforms from args, so the merge happens here (explicit flags
    still win; a non-registry --pretrained path merges nothing)."""
    if not getattr(args, "pretrained", None):
        return
    from cosmos_tpu.models.pretrained import get_pretrained_cfg

    pcfg = get_pretrained_cfg(args.model, args.pretrained)
    for flag, key in (("image_mean", "mean"), ("image_std", "std"),
                      ("image_interpolation", "interpolation"),
                      ("image_resize_mode", "resize_mode")):
        if getattr(args, flag, None) is None and pcfg.get(key):
            setattr(args, flag, pcfg[key])


def main(argv=None) -> Dict:
    from cosmos_tpu.training.params import parse_args

    args = parse_args(argv)

    import jax

    from cosmos_tpu.models.factory import create_model, get_tokenizer
    from cosmos_tpu.parallel.mesh import (
        create_mesh,
        init_distributed,
        shard_batch,
    )
    from cosmos_tpu.training.checkpoint import (
        get_latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from cosmos_tpu.training.data_pipeline import get_data
    from cosmos_tpu.training.evaluate import evaluate
    from cosmos_tpu.training.logger import setup_logging
    from cosmos_tpu.training.scheduler import cosine_scheduler, get_lr_scheduler
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    from cosmos_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    random_seed(args.seed)
    process_index, process_count = init_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    is_master = process_index == 0

    args.name = experiment_name(args)
    log_dir = os.path.join(args.logs_dir, args.name)
    if is_master:
        os.makedirs(log_dir, exist_ok=True)
    setup_logging(
        os.path.join(log_dir, "out.log") if is_master else None,
        level=logging.DEBUG if args.debug else logging.INFO,
        include_host=process_count > 1,
    )
    if args.checkpoint_path is None:
        args.checkpoint_path = os.path.join(log_dir, "checkpoints")

    devices = jax.devices()
    # --mesh-shape: "N" = 1-D data mesh over N devices (shard_map step);
    # "dp,tp" = 2-D (data, model) mesh — GSPMD tensor-parallel training
    # (train.make_train_step_gspmd, parallel/tp.py weight placement)
    tp_size = 1
    num_slices = getattr(args, "num_slices", 1) or 1
    if args.mesh_shape and "," in args.mesh_shape:
        dp_s, tp_s = args.mesh_shape.split(",")
        tp_size = int(tp_s)
        if num_slices > 1:
            raise ValueError(
                "--num-slices composes with the 1-D data mesh only; "
                "drop the ',tp' --mesh-shape")
        if tp_size > 1:
            from cosmos_tpu.parallel.tp import create_tp_mesh

            mesh = create_tp_mesh(int(dp_s), tp_size)
        else:
            mesh = create_mesh(int(dp_s))
    elif num_slices > 1:
        from cosmos_tpu.parallel.mesh import create_multislice_mesh

        mesh = create_multislice_mesh(
            num_slices,
            (int(args.mesh_shape) // num_slices if args.mesh_shape
             else None),
        )
    else:
        mesh = create_mesh(
            int(args.mesh_shape) if args.mesh_shape else None
        )
    # FSDP rides the same GSPMD step as TP training: placement-only
    # change.  --fsdp with a 2-D 'dp,tp' mesh composes them
    # (parallel/fsdp.py fsdp_tp_spec: ZeRO-3 over 'data' on the dims
    # Megatron leaves unsharded).
    if args.fsdp and num_slices > 1:
        raise ValueError(
            "--fsdp (GSPMD global-batch step) does not compose with "
            "--num-slices (shard_map hierarchical-gather step) yet; "
            "pick one")
    use_gspmd = tp_size > 1 or args.fsdp
    local_device_count = jax.local_device_count()
    logger.info(
        f"process {process_index}/{process_count}, devices={len(devices)}, "
        f"mesh={mesh.shape}" + (" (fsdp)" if args.fsdp else "")
    )

    # params dump (main.py:344-349)
    if is_master:
        with open(os.path.join(log_dir, "params.txt"), "w") as f:
            for k in sorted(vars(args)):
                f.write(f"{k}: {getattr(args, k)}\n")

    if is_master and getattr(args, "copy_codebase", False):
        # reproducibility snapshot (reference main.py:604-619): copy the
        # installed cosmos_tpu package next to the run's logs
        import shutil

        import cosmos_tpu as _pkg

        code_dir = os.path.join(log_dir, "code")
        if os.path.exists(code_dir):
            logger.warning(f"--copy-codebase: {code_dir} already exists; "
                           "skipping (use --name for a fresh experiment)")
        else:
            src = os.path.dirname(os.path.abspath(_pkg.__file__))
            shutil.copytree(
                src, os.path.join(code_dir, "cosmos_tpu"),
                ignore=shutil.ignore_patterns(
                    "__pycache__", "*.pyc", "logs", "wandb"),
            )
            logger.info(f"copied codebase to {code_dir}")

    # --- model -----------------------------------------------------------
    pretrained = args.pretrained
    if args.huggingface_model_name:
        from cosmos_tpu.models.pretrained import download_pretrained_from_hf

        pretrained = download_pretrained_from_hf(
            args.huggingface_repo_name, args.huggingface_model_name
        )
    apply_pretrained_preprocess_flags(args)
    model_overrides = {}
    if args.siglip:
        # SigLIP init: logit scale ln(10), bias -10 (clip_segmentor.py:35-37)
        model_overrides = {"init_logit_scale": float(np.log(10.0)),
                           "init_logit_bias": -10.0}
    if getattr(args, "pool_type", None):
        # explicit vision-pooling override (reference factory.py:271)
        model_overrides["vision_pool_type"] = args.pool_type
    model, params = create_model(
        args.model,
        pretrained=pretrained or None,
        precision=args.precision,
        cosmos=args.cosmos,
        **model_overrides,
        output_all=args.output_all,
        attentional_pool=args.attentional_pool,
        add_zero_attn=args.add_zero_attn,
        grad_checkpointing=args.grad_checkpointing,
        remat_policy=args.remat_policy,
        # tri-state: 'on' forces the fused kernel, 'off' forces the exact
        # XLA softmax path, 'auto' (None) picks by backend
        use_flash={"auto": None, "on": True, "off": False}[args.flash_attention],
        act_approx=args.gelu_approx,
        text_bucket=args.text_bucket,
        force_quick_gelu=args.force_quick_gelu,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=args.force_image_size,
        seed=args.seed,
    )
    tokenizer = get_tokenizer(args.model)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"model {args.model}: {n_params/1e6:.1f}M params")

    # frozen distillation teacher (reference main.py:289-296): a second
    # CLIP whose params never enter the optimizer or the checkpoint
    dist_model = dist_params = None
    if args.distill:
        dist_model, dist_params = create_model(
            args.distill_model,
            pretrained=args.distill_pretrained,
            precision=args.precision,
        )
        logger.info(
            f"distilling from {args.distill_model} ({args.distill_pretrained})"
        )

    image_size = model.cfg.vision_cfg.image_size

    if args.trace:
        # AOT serving export (reference --trace, model.py:639-654)
        from cosmos_tpu.models.trace import save_traced, trace_model

        artifacts = trace_model(model, params, batch_size=args.batch_size)
        trace_dir = args.trace_path or os.path.join(log_dir, "traced")
        if is_master:
            save_traced(artifacts, trace_dir)
        logger.info(f"traced encoders -> {trace_dir}")

    # --- data ------------------------------------------------------------
    data = get_data(
        args,
        tokenizer,
        process_index=process_index,
        process_count=process_count,
        local_device_count=local_device_count,
        image_size=image_size,
        context_length=model.cfg.text_cfg.context_length,
    )

    # --- eval-only modes (main.py:518-534) -------------------------------
    if args.eval_mode == "segmentation":
        raise SystemExit(
            "--eval-mode segmentation: segmentation has its own CLI — "
            "python -m cosmos_tpu.training.seg_eval (see "
            "scripts/inference_segmentation.sh)"
        )
    if "train" not in data or args.eval_mode:
        class _EvalState:
            def __init__(self, p):
                self.params = p
                self.teacher_params = None

        state = _EvalState(params)
        if pretrained:
            # the reference loads BOTH student and teacher from the ckpt;
            # teacher is what segmentation uses (clip_segmentor.py:103-109)
            from cosmos_tpu.models.checkpoint import load_checkpoint

            try:
                state.teacher_params = load_checkpoint(
                    model, params, pretrained, which="teacher"
                )
            except Exception:
                state.teacher_params = None
        metrics = evaluate(model, state, tokenizer, data, epoch=0, args=args)
        if is_master:
            print(json.dumps(metrics, default=float))
        return metrics

    # --- optimizer / schedules (main.py:373-470) -------------------------
    train_info = data["train"]
    steps_per_epoch = train_info.num_batches
    total_steps = steps_per_epoch * args.epochs
    if getattr(args, "skip_scheduler", False):
        # reference train.py:103: no per-step scheduler call — the LR
        # stays at the base value with no warmup or decay
        base_lr = float(args.lr)
        lr_schedule = lambda step: base_lr  # noqa: E731
    else:
        if args.lr_scheduler == "const-cooldown" and not args.epochs_cooldown:
            # reference main.py asserts this; cooldown_steps=0 would
            # silently run a plain constant LR (and 0-divide in the
            # never-taken cooldown branch)
            raise ValueError(
                "--lr-scheduler const-cooldown requires --epochs-cooldown"
            )
        lr_schedule = get_lr_scheduler(
            args.lr_scheduler,
            args.lr,
            args.warmup,
            total_steps,
            cooldown_steps=steps_per_epoch * (args.epochs_cooldown or 0),
            cooldown_power=args.lr_cooldown_power,
            cooldown_end_lr=args.lr_cooldown_end,
        )
    optimizer = create_optimizer(
        lr_schedule,
        beta1=args.beta1,
        beta2=args.beta2,
        eps=args.eps,
        weight_decay=args.wd,
        grad_clip_norm=args.grad_clip_norm,
        lock_image=args.lock_image,
        lock_text=args.lock_text,
        lock_image_unlocked_groups=args.lock_image_unlocked_groups,
        lock_text_unlocked_layers=args.lock_text_unlocked_layers,
        lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm,
    )
    momentum_schedule = cosine_scheduler(
        args.momentum_teacher, 1.0, 0, total_steps
    )
    import jax.numpy as jnp

    is_coca = model.cfg.multimodal_cfg is not None
    # static frozen-leaf mask: zeroes locked grads INSIDE the step so the
    # clip norm / grad_norm metric cover the trainable subset only and
    # XLA drops the frozen towers' dW work (reference: requires_grad=False
    # params have no grads at all)
    frozen = None
    if args.lock_image or args.lock_text:
        from cosmos_tpu.training.train import frozen_mask

        frozen = frozen_mask(
            params, args.lock_image, args.lock_text,
            args.lock_image_unlocked_groups,
            args.lock_text_unlocked_layers,
            args.lock_text_freeze_layer_norm,
        )
    step_cfg = TrainStepConfig(
        frozen=frozen,
        seed=args.seed,
        cosmos=args.cosmos,
        siglip=args.siglip,
        distill=args.distill,
        coca=is_coca,
        coca_caption_loss_weight=args.coca_caption_loss_weight,
        coca_contrastive_loss_weight=args.coca_contrastive_loss_weight,
        coca_pad_id=getattr(model, "pad_id", 0),
        local_loss=args.local_loss,
        gather_with_grad=args.gather_with_grad,
        gather_scope=getattr(args, "gather_scope", "global"),
        momentum_schedule=momentum_schedule,
        fix_momentum=args.fix_momentum,
        momentum_teacher=args.momentum_teacher,
        lr_schedule=lr_schedule,
        input_dtype=(jnp.bfloat16 if args.precision in
                     ("amp", "amp_bf16", "bf16", "pure_bf16", "fp16")
                     else jnp.float32),
        accum_freq=args.accum_freq,
        # norm is ~free when clipping computes it anyway (XLA CSE);
        # otherwise it costs a full grad re-read per step — opt-in
        log_grad_norm=(args.grad_clip_norm is not None
                       or args.log_grad_norm),
        **({"image_mean": tuple(args.image_mean)} if args.image_mean else {}),
        **({"image_std": tuple(args.image_std)} if args.image_std else {}),
    )
    if use_gspmd:
        from cosmos_tpu.training.train import make_train_step_gspmd

        step_fn = make_train_step_gspmd(model, optimizer, mesh, step_cfg,
                                        dist_model=dist_model)
    else:
        step_fn = make_train_step(model, optimizer, mesh, step_cfg,
                                  dist_model=dist_model)
    if args.distill:
        # transfer the frozen teacher once (replicated); the lambda keeps
        # the train loop's (state, batch) calling convention
        from jax.sharding import NamedSharding, PartitionSpec as _P

        dist_params = jax.device_put(
            dist_params, NamedSharding(mesh, _P())
        )
        _raw_step = step_fn
        step_fn = lambda s, b: _raw_step(s, b, dist_params)  # noqa: E731
    def _make_state(p_, opt_, mesh_, tp_):
        if args.fsdp:
            from cosmos_tpu.training.train import create_train_state_fsdp

            return create_train_state_fsdp(p_, opt_, mesh_)
        if tp_ > 1:
            from cosmos_tpu.training.train import create_train_state_gspmd

            return create_train_state_gspmd(p_, opt_, mesh_)
        return create_train_state(p_, opt_, mesh_)

    if args.init_last_layer:
        from cosmos_tpu.models.init_utils import reinit_last_transformer_layer

        # teacher copies BEFORE re-init in the reference, then both get
        # independent re-draws (main.py:278-283) — replicate by building
        # the state from separately re-drawn student/teacher params
        student_p = reinit_last_transformer_layer(
            params, jax.random.PRNGKey(args.seed + 1)
        )
        teacher_p = reinit_last_transformer_layer(
            params, jax.random.PRNGKey(args.seed + 2)
        )
        state = _make_state(student_p, optimizer, mesh, tp_size)
        # deep-copy: student/teacher must not alias any buffer (donation)
        state = state.replace(
            teacher_params=jax.tree.map(jnp.copy, teacher_p)
        )
    else:
        state = _make_state(params, optimizer, mesh, tp_size)

    # --- resume (main.py:150-188, 406-435) -------------------------------
    start_epoch = 0
    resume = args.resume
    if resume == "latest":
        # discovery on process 0 ONLY, then broadcast (reference
        # main.py:150-188): independent per-process discovery races a
        # concurrent save and can restore different epochs per host
        from cosmos_tpu.parallel.mesh import broadcast_object

        resume = broadcast_object(
            get_latest_checkpoint(args.checkpoint_path)
            if process_index == 0 else None
        )
        logger.info(f"resume latest -> {resume}")
    if resume:
        # saved meta 'epoch' is the COMPLETED-epoch count (main.py:551),
        # so training continues from that index
        state, start_epoch = restore_checkpoint(state, resume)
        # re-commit onto the mesh: restore hands back HOST arrays, and an
        # uncommitted state re-triggers the double-compile
        # create_train_state(mesh) exists to avoid (~10 min on v5e)
        if use_gspmd:
            # GSPMD placements (TP or FSDP): params/teacher by the mode's
            # specs; the optimizer state adopts the shardings a fresh
            # init of the SHARDED params produces (same tree structure)
            if args.fsdp:
                from cosmos_tpu.parallel.fsdp import (
                    shard_params_fsdp as _shard_fn,
                )
            else:
                from cosmos_tpu.parallel.tp import (
                    shard_params_tp as _shard_fn,
                )

            from jax.sharding import NamedSharding as _NS
            from jax.sharding import PartitionSpec as _PS

            new_p = _shard_fn(state.params, mesh)
            new_t = _shard_fn(state.teacher_params, mesh)
            opt_template = optimizer.init(new_p)
            rep = _NS(mesh, _PS())

            def _opt_sharding(t):
                # Adam mu/nu inherit mesh shardings from the sharded
                # params; scalar leaves (count) come out single-device
                # uncommitted — replicate those over the mesh instead
                s = t.sharding
                return s if (isinstance(s, _NS) and s.mesh == mesh) else rep

            new_o = jax.tree.map(
                lambda v, t: jax.device_put(v, _opt_sharding(t)),
                state.opt_state, opt_template,
            )
            state = state.replace(params=new_p, teacher_params=new_t,
                                  opt_state=new_o)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            state = jax.device_put(state, NamedSharding(mesh, _P()))
        logger.info(f"resumed from {resume} at epoch {start_epoch}")

    # --- remote sync daemon (main.py:193-214) ----------------------------
    sync_proc = None
    if args.remote_sync and is_master:
        from cosmos_tpu.training.file_utils import remote_sync, start_sync_process

        if not remote_sync(args.checkpoint_path, args.remote_sync,
                           args.remote_sync_protocol):
            logger.error("initial remote sync failed — continuing without")
        else:
            sync_proc = start_sync_process(
                args.remote_sync_frequency,
                args.checkpoint_path,
                args.remote_sync,
                args.remote_sync_protocol,
            )
            sync_proc.start()

    # --- reporting (main.py:474-506) -------------------------------------
    writer = None
    wandb_run = None
    if is_master and "tensorboard" in args.report_to:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(log_dir, "tensorboard"))
        except Exception as e:
            logger.warning(f"tensorboard unavailable: {e}")
    if is_master and "wandb" in args.report_to:
        try:
            import wandb

            wandb_run = wandb.init(
                project=args.wandb_project_name,
                entity=getattr(args, "wandb_entity_name", None),
                notes=getattr(args, "wandb_notes", ""),
                name=args.name,
                config=vars(args),
                resume="auto",
            )
        except Exception as e:
            logger.warning(f"wandb unavailable: {e}")

    # --- epoch loop (main.py:540-584) ------------------------------------
    if args.profile_steps > 0:
        import jax.profiler as _prof

        profile_dir = os.path.join(log_dir, "profile")
        logger.info(f"profiling first {args.profile_steps} steps -> {profile_dir}")
        _prof.start_trace(profile_dir)

    loader_iter = iter(train_info.dataloader)
    global_batch = args.batch_size * local_device_count * process_count
    # eval runs on the master process only (reference rank-0 gating,
    # train.py:327-328); in a multi-host run it must jit over a HOST-LOCAL
    # mesh — a global-mesh jit entered by one process would deadlock the
    # rest.  evaluate() pulls the replicated params host-local first.
    eval_mesh = (
        mesh if process_count == 1 else create_mesh(devices=jax.local_devices())
    )
    all_metrics: Dict[str, float] = {}
    for epoch in range(start_epoch, args.epochs):
        logger.info(f"epoch {epoch} start")
        train_info.set_epoch(epoch)
        state, epoch_metrics = train_one_epoch(
            step_fn, state, loader_iter, mesh, steps_per_epoch,
            epoch=epoch, args=args, writer=writer, wandb_run=wandb_run,
            global_batch=global_batch, shard_batch_fn=shard_batch,
        )
        all_metrics.update(epoch_metrics)
        if args.profile_steps > 0 and epoch == start_epoch:
            import jax.profiler as _prof

            _prof.stop_trace()
            args.profile_steps = 0

        completed = epoch + 1
        # any GSPMD sharding (--fsdp OR tensor parallelism) on 2+ hosts
        # shards params/teacher across processes, so the master-only eval
        # and the checkpoint device_get cannot see full tensors alone:
        # every process joins an allgather first (host_state), then
        # master proceeds as in the replicated case.  Gating on fsdp
        # alone would leave a TP multi-host run saving from one process
        # while host_state runs a real collective — a distributed hang.
        gspmd_multihost = use_gspmd and process_count > 1
        eval_now = args.val_frequency and (
            completed % args.val_frequency == 0 or completed == args.epochs
        )
        eval_state = state
        if eval_now and gspmd_multihost:
            from cosmos_tpu.training.checkpoint import host_state

            eval_state = state.replace(
                params=host_state(state.params),
                teacher_params=(
                    host_state(state.teacher_params)
                    if state.teacher_params is not None else None
                ),
            )
        if eval_now and is_master:
            eval_metrics = evaluate(model, eval_state, tokenizer, data,
                                    completed, args, mesh=eval_mesh)
            all_metrics.update(eval_metrics)
            if writer is not None:
                for k, v in eval_metrics.items():
                    if isinstance(v, (int, float)):
                        writer.add_scalar(f"eval/{k}", v, completed)

        # master-only: params are replicated so host 0 holds the full
        # state, and concurrent same-path Orbax saves from every process
        # would race on the snapshot dir and the latest pointer
        # (reference gates saving on is_master too, main.py:552)
        # the FINAL epoch always saves, whatever the cadence (reference
        # main.py:565: completed_epoch == args.epochs OR save_frequency
        # divides) — otherwise --epochs 10 --save-frequency 3 would train
        # to completion and silently drop the fully-trained model
        save_now = completed == args.epochs or (
            args.save_frequency and completed % args.save_frequency == 0
        )
        # ANY multi-host run: EVERY process calls save_checkpoint.  Two
        # collectives live inside it — host_state's allgather for
        # cross-host-sharded (GSPMD) leaves AND Orbax's own save
        # barrier, which engages whenever process_count > 1 regardless
        # of sharding.  Plain writes stay process-0-gated inside.
        if save_now and (is_master or process_count > 1):
            save_checkpoint(
                state,
                args.checkpoint_path,
                completed,
                name=args.name,
                config={k: str(v) for k, v in vars(args).items()},
                save_latest=args.save_most_recent,
                delete_previous=args.delete_previous_checkpoint,
            )

    if sync_proc is not None:
        sync_proc.terminate()
        # one FINAL sync after the daemon stops: checkpoints written inside
        # the last remote_sync_frequency window would otherwise never
        # upload (reference main.py:603-607 does the same explicit sync)
        from cosmos_tpu.training.file_utils import remote_sync

        if not remote_sync(args.checkpoint_path, args.remote_sync,
                           args.remote_sync_protocol):
            logger.error("final remote sync failed")
    return all_metrics


def train_one_epoch(
    step_fn,
    state,
    loader_iter,
    mesh,
    steps_per_epoch: int,
    *,
    epoch: int,
    args,
    writer=None,
    wandb_run=None,
    global_batch: int,
    shard_batch_fn,
):
    """Hot loop (train.py:69-321): fetch batch, shard, step, log meters."""
    import jax
    import numpy as _np

    metrics = {}
    data_time = step_time = 0.0
    # throughput window: samples/s divides the samples dispatched since the
    # LAST LOG by the wall time since then — resetting the baseline every
    # iteration (the old t_end = t_data) inflated the figure ~log_every_n×
    # exactly when the input pipeline is the bottleneck, masking the
    # data-bound regime the meter exists to diagnose
    samples_per_step = global_batch * max(1, args.accum_freq)

    def _device_batches():
        """Assemble + shard (device_put) each batch; run by the prefetch
        thread so the H2D leg overlaps the current step's device time
        (the TPU-native stand-in for torch's pinned-memory async H2D)."""
        for _ in range(steps_per_epoch):
            if args.accum_freq > 1:
                micro = [next(loader_iter) for _ in range(args.accum_freq)]
                mb = {
                    k: _np.stack([m[k] for m in micro]) for k in micro[0]
                }
                yield shard_batch_fn(mb, mesh, batch_axis=2)
            else:
                yield shard_batch_fn(next(loader_iter), mesh, batch_axis=1)

    depth = max(0, getattr(args, "prefetch_depth", 2))
    if depth:
        from cosmos_tpu.data.prefetch import DevicePrefetcher

        batch_iter = DevicePrefetcher(_device_batches(), depth=depth)
    else:
        batch_iter = _device_batches()

    t_end = time.perf_counter()
    t_window, steps_in_window = t_end, 0
    profile_remaining = getattr(args, "profile_steps", 0)
    try:
        # (try/finally, not `with`: batch_iter is a plain generator when
        # prefetch is disabled — only the prefetcher needs close())
        for i in range(steps_per_epoch):
            if profile_remaining and i == profile_remaining:
                import jax.profiler as _prof

                float(metrics.get("loss", 0.0))  # flush before stopping
                try:
                    _prof.stop_trace()
                except RuntimeError:
                    pass
                args.profile_steps = 0
                profile_remaining = 0
            batch = next(batch_iter)
            t_data = time.perf_counter()
            data_time += t_data - t_end
            state, m = step_fn(state, batch)
            steps_in_window += 1
            if (i % args.log_every_n_steps == 0) or (i == steps_per_epoch - 1):
                loss = float(m["loss"])  # forces completion of the chain
                t_step = time.perf_counter()
                step_time += t_step - t_data
                samples_per_sec = (
                    samples_per_step * steps_in_window
                    / max(t_step - t_window, 1e-9)
                )
                scalars = {
                    k: float(v) for k, v in m.items()
                }
                logger.info(
                    f"epoch {epoch} step {i}/{steps_per_epoch} "
                    f"loss {loss:.4f} "
                    + " ".join(
                        f"{k} {v:.4g}" for k, v in scalars.items()
                        if k != "loss"
                    )
                    + f" samples/s {samples_per_sec:.1f}"
                    + f" data_t {data_time:.2f}s"
                )
                step_num = epoch * steps_per_epoch + i
                if writer is not None:
                    for k, v in scalars.items():
                        writer.add_scalar(f"train/{k}", v, step_num)
                    writer.add_scalar("train/samples_per_sec",
                                      samples_per_sec, step_num)
                if wandb_run is not None:
                    wandb_run.log(
                        {**{f"train/{k}": v for k, v in scalars.items()},
                         "train/samples_per_sec": samples_per_sec},
                        step=step_num,
                    )
                metrics = scalars
                data_time = 0.0
                t_end = time.perf_counter()
                t_window, steps_in_window = t_end, 0
            else:
                t_end = time.perf_counter()
    finally:
        # an exception mid-epoch must not leave the producer thread
        # parked on a full queue of device-committed batches (HBM)
        if hasattr(batch_iter, "close"):
            batch_iter.close()
    return state, {f"train_{k}": v for k, v in metrics.items()}


if __name__ == "__main__":
    main()
