"""get_data: assemble train/val/eval loaders from trainer args.

Parity target: /root/reference/src/training/data.py:915-957 get_data
dispatch -> {'train': DataInfo, 'val': ..., 'coco-retrieval': ...,
'flickr-retrieval': ..., 'imagenet-val': ..., <classification sets>}.
"""

from __future__ import annotations

import logging
import os
import random
from typing import Dict, Iterator

import numpy as np

from cosmos_tpu.data.caption import sample_captions
from cosmos_tpu.data.datasets import RetrievalData, ImageFolderDataset, SyntheticDataset
from cosmos_tpu.data.loader import (
    DataInfo,
    MapDatasetLoader,
    WdsTrainConfig,
    WdsTrainLoader,
    collate_views,
)
from cosmos_tpu.data.transforms import MulticropAugmentation
from cosmos_tpu.data.webdataset import expand_urls

logger = logging.getLogger(__name__)


def _train_transform(cfg: WdsTrainConfig):
    """Same transform-selection rule the wds worker uses (loader.py):
    multicrop recipe when --use-imagecrop-aug, else the plain train
    transform producing ONE crop."""
    if cfg.use_multicrop:
        return MulticropAugmentation(
            image_size=cfg.image_size,
            local_crops_number=cfg.local_crops_number,
            global_crops_number=cfg.global_crops_number,
            crop_scale=cfg.crop_scale,
            local_size=cfg.local_size,
            as_uint8=True,
        )
    from cosmos_tpu.data.transforms import image_transform_train

    return image_transform_train(
        cfg.image_size, aug_cfg=cfg.aug_cfg, as_uint8=True
    )


class SyntheticTrainLoader:
    """Batches from SyntheticDataset shaped like the wds train stream."""

    def __init__(self, cfg: WdsTrainConfig, num_samples: int = 4096):
        from cosmos_tpu.data.tokenizer import SimpleTokenizer

        self.cfg = cfg
        self.dataset = SyntheticDataset(num_samples, image_size=cfg.image_size)
        self.tokenizer = SimpleTokenizer(context_length=cfg.context_length)
        self.transform = _train_transform(cfg)
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            # re-read per epoch: main.py calls set_epoch on a LONG-LIVED
            # iterator (one iter() for the whole run), so the stream must
            # re-key itself when the epoch advances — that is what makes
            # resume-at-epoch-k reproduce epoch k's batches.  Hosts
            # diverge via process_index (seed and sample stride).
            epoch = self._epoch
            rng = random.Random(
                (self.cfg.seed + epoch) * self.cfg.process_count
                + self.cfg.process_index
            )
            idx = self.cfg.process_index
            g = self.cfg.global_crops_number if self.cfg.use_multicrop else 1
            n = self.cfg.local_crops_number if self.cfg.use_multicrop else 0
            while self._epoch == epoch:
                buf = []
                for _ in range(self.cfg.batch_size):
                    img, meta = self.dataset[idx % len(self.dataset)]
                    idx += self.cfg.process_count
                    crops = self.transform(img, rng)
                    if not isinstance(crops, list):
                        crops = [crops]
                    caps = sample_captions(
                        meta, self.cfg.num_sampled_captions,
                        self.cfg.caption_sampling_mode, rng,
                    )
                    buf.append((crops, self.tokenizer(caps)))
                yield collate_views(buf, g, n)


class CsvTrainLoader:
    """Train batches from a CSV of (image path, caption) rows
    (reference CsvDataset, data.py:48-66) shaped like the wds stream."""

    def __init__(self, cfg: WdsTrainConfig, csv_path: str, img_key: str,
                 caption_key: str, sep: str):
        from cosmos_tpu.data.datasets import CsvDataset
        from cosmos_tpu.data.tokenizer import SimpleTokenizer

        self.cfg = cfg
        ds = CsvDataset(csv_path, transform=None, img_key=img_key,
                        caption_key=caption_key, sep=sep)
        self.rows = list(zip(ds.images, ds.captions))
        if not self.rows:
            raise ValueError(f"no rows in {csv_path}")
        # the loop drops the partial batch at pass end; with fewer rows
        # per host than one batch a full pass yields NOTHING and the
        # "no readable images" error below would mislead (every image may
        # decode fine) — name the real constraint up front
        per_host = len(self.rows) // max(1, cfg.process_count)
        if per_host < cfg.batch_size:
            raise ValueError(
                f"CSV loader: {len(self.rows)} rows across "
                f"{cfg.process_count} process(es) leaves {per_host} rows "
                f"per host — fewer than one batch (batch_size="
                f"{cfg.batch_size}); shrink --batch-size or provide more "
                "rows"
            )
        self.tokenizer = SimpleTokenizer(context_length=cfg.context_length)
        self.transform = _train_transform(cfg)
        self._epoch = 0

    def __len__(self):
        return len(self.rows)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self):
        from PIL import Image

        pass_no, prev_epoch = 0, None
        while True:
            # rng keyed on (CURRENT epoch, pass): set_epoch arrives on a
            # long-lived iterator (see SyntheticTrainLoader), the mid-pass
            # break below aligns pass boundaries to epoch boundaries, so a
            # resume at epoch k reproduces epoch k's stream exactly while
            # successive passes within one epoch still reshuffle.  Every
            # host runs the SAME global shuffle then takes a disjoint
            # strided slice — the reference partitions with a seed-synced
            # DistributedSampler (dataloaders/utils.py:41-73), without
            # which multi-host CSV training feeds identical
            # (duplicate-negative) batches.
            epoch = self._epoch
            pass_no = pass_no + 1 if epoch == prev_epoch else 0
            prev_epoch = epoch
            rng = random.Random((self.cfg.seed + epoch) * 100003 + pass_no)
            order = list(range(len(self.rows)))
            rng.shuffle(order)
            order = order[self.cfg.process_index::self.cfg.process_count]
            crops_list, tokens_list = [], []
            yielded = 0
            for idx in order:
                if self._epoch != epoch:
                    break  # epoch advanced mid-pass: re-key immediately
                path, caption = self.rows[idx]
                try:
                    img = Image.open(path).convert("RGB")
                except Exception as e:
                    logger.warning(f"csv row {idx}: unreadable image "
                                   f"{path!r} ({e!r})")
                    continue
                crops = self.transform(img, rng)
                if not isinstance(crops, list):
                    crops = [crops]
                crops_list.append(crops)
                meta = {"raw_caption": [caption]}
                caps = sample_captions(
                    meta, self.cfg.num_sampled_captions,
                    self.cfg.caption_sampling_mode
                    if self.cfg.caption_sampling_mode in ("raw", "random")
                    else "random",
                    rng,
                )
                tokens_list.append(self.tokenizer(caps))
                if len(crops_list) == self.cfg.batch_size:
                    g = self.cfg.global_crops_number if self.cfg.use_multicrop else 1
                    n = self.cfg.local_crops_number if self.cfg.use_multicrop else 0
                    yield collate_views(
                        list(zip(crops_list, tokens_list)), g, n
                    )
                    yielded += 1
                    crops_list, tokens_list = [], []
            if yielded == 0 and self._epoch == epoch:
                # a full pass produced NOTHING: every image unreadable
                # (wrong cwd / corrupt files) — fail instead of silently
                # re-shuffling forever at step 0
                raise RuntimeError(
                    f"CSV loader: no readable images in any of "
                    f"{len(self.rows)} rows (see warnings above; are the "
                    "image paths relative to a different directory?)"
                )



def _detect_dataset_type(args) -> str:
    if args.dataset_type != "auto":
        return args.dataset_type
    if args.train_data is None:
        return "none"
    ext = args.train_data.split(".")[-1]
    if ext in ("csv", "tsv"):
        return "csv"
    return "webdataset"


def make_train_config(args, process_index: int = 0, process_count: int = 1,
                      local_device_count: int = 1) -> WdsTrainConfig:
    urls, weights = expand_urls(
        args.train_data or "", args.train_data_upsampling_factors
    )
    if args.use_imagecrop_aug and args.global_crops_number != 2:
        # fail HERE in the main process with the flag name — inside a
        # loader worker the same error surfaces only as a generic
        # "workers died" after a 30s timeout
        raise ValueError(
            "--global-crops-number must be 2 with --use-imagecrop-aug "
            "(the COSMOS/DINO recipe; reference train.py:112)"
        )
    return WdsTrainConfig(
        urls=urls,
        weights=weights,
        batch_size=args.batch_size * local_device_count,
        num_workers=args.workers,
        global_crops_number=args.global_crops_number,
        local_crops_number=args.local_crops_number if args.use_imagecrop_aug else 0,
        image_size=getattr(args, "image_size", 224),
        crop_scale=args.crop_scale,
        num_sampled_captions=(
            args.num_sampled_captions if args.caption_sampling_mode != "raw" else 1
        ),
        caption_sampling_mode=args.caption_sampling_mode,
        context_length=getattr(args, "context_length", 77),
        seed=args.seed,
        process_index=process_index,
        process_count=process_count,
        resampled=args.dataset_resampled,
        use_multicrop=args.use_imagecrop_aug,
        aug_cfg=getattr(args, "aug_cfg", None) or None,
    )


def get_data(
    args,
    tokenizer,
    *,
    process_index: int = 0,
    process_count: int = 1,
    local_device_count: int = 1,
    image_size: int = 224,
    context_length: int = 77,
) -> Dict[str, object]:
    data: Dict[str, object] = {}
    args.image_size = image_size
    args.context_length = context_length
    dtype = _detect_dataset_type(args)
    global_batch = args.batch_size * local_device_count * process_count
    # one optimizer step consumes accum_freq micro-batches, so an epoch's
    # step count divides by it (reference train.py:106:
    # num_batches_per_epoch = dataloader.num_batches // args.accum_freq) —
    # otherwise each "epoch" would traverse the dataset accum_freq times
    # and the LR schedule's total_steps would overshoot the sample budget
    samples_per_step = global_batch * max(1, getattr(args, "accum_freq", 1))

    if dtype in ("webdataset", "synthetic"):
        cfg = make_train_config(args, process_index, process_count,
                                local_device_count)
        if dtype == "synthetic":
            loader = SyntheticTrainLoader(cfg, num_samples=args.train_num_samples
                                          or 4096)
            num_samples = args.train_num_samples or 4096
        else:
            loader = WdsTrainLoader(cfg)
            if not args.train_num_samples:
                raise ValueError(
                    "--train-num-samples is required for webdataset training"
                )
            num_samples = args.train_num_samples
        num_batches = args.steps_per_epoch or max(1, num_samples // samples_per_step)
        data["train"] = DataInfo(loader, num_samples, num_batches)
    elif dtype == "csv":
        cfg = make_train_config(args, process_index, process_count,
                                local_device_count)
        loader = CsvTrainLoader(
            cfg, args.train_data, args.csv_img_key, args.csv_caption_key,
            args.csv_separator,
        )
        num_samples = args.train_num_samples or len(loader)
        num_batches = args.steps_per_epoch or max(1, num_samples // samples_per_step)
        data["train"] = DataInfo(loader, num_samples, num_batches)

    from cosmos_tpu.data.transforms import eval_transform_from_args

    eval_tf = eval_transform_from_args(args, image_size)

    if args.val_data:
        from cosmos_tpu.data.loader import WdsValLoader

        val_urls, _ = expand_urls(args.val_data)
        data["val"] = WdsValLoader(
            val_urls,
            batch_size=args.batch_size,
            image_size=image_size,
            context_length=context_length,
            num_samples=args.val_num_samples,
            eval_tf=eval_tf,
        )

    if getattr(args, "train_eval_data", None):
        # train-distribution eval split (reference data.py:923-925): same
        # val-style reader over TRAIN shards, capped at a fixed sample
        # count — an overfitting monitor alongside the held-out val loss
        from cosmos_tpu.data.loader import WdsValLoader

        te_urls, _ = expand_urls(args.train_eval_data)
        data["train_eval"] = WdsValLoader(
            te_urls,
            batch_size=args.batch_size,
            image_size=image_size,
            context_length=context_length,
            num_samples=getattr(args, "train_val_num_samples", 5120),
            eval_tf=eval_tf,
        )

    if args.data_root_dir:
        coco_dir = os.path.join(args.data_root_dir, "coco")
        flickr_dir = os.path.join(args.data_root_dir, "flickr30k-images")
        if os.path.isdir(coco_dir):
            data["coco-retrieval"] = RetrievalData.load(
                "coco", coco_dir, tokenizer
            )
        if os.path.isdir(flickr_dir):
            data["flickr-retrieval"] = RetrievalData.load(
                "flickr", flickr_dir, tokenizer, split="test"
            )

    if args.imagenet_val:
        ds = ImageFolderDataset(args.imagenet_val, transform=eval_tf)
        data["imagenet-val"] = MapDatasetLoader(ds, args.batch_size)

    if args.imagenet_v2:
        # ImageNetV2 (reference data.py:144-146): folder of integer class
        # dirs 0..999; numeric dir ordering in ImageFolderDataset matches
        ds = ImageFolderDataset(args.imagenet_v2, transform=eval_tf)
        data["imagenet-v2"] = MapDatasetLoader(ds, args.batch_size)

    if args.classification_data_dir and args.zeroshot_eval_datasets:
        from cosmos_tpu.data.classification import ClassificationDataset
        from cosmos_tpu.training.zero_shot import bank_key

        for name in args.zeroshot_eval_datasets.split(","):
            name = name.strip()
            if not name:
                continue
            root = os.path.join(args.classification_data_dir, name)
            if not os.path.isdir(root):
                logger.warning(f"classification dataset dir missing: {root}")
                continue
            try:
                ds = ClassificationDataset(name, root, transform=eval_tf)
            except (KeyError, FileNotFoundError) as e:
                logger.warning(
                    f"{name}: native reader failed ({e}); "
                    "falling back to class-folder layout"
                )
                ds = ImageFolderDataset(root, transform=eval_tf)
            # store under the CANONICAL name: the eval loop iterates
            # zero_shot.CLASSIFICATION_DATASETS ('aircraft', 'pets', ...)
            # — an alias key ('fgvc_aircraft') would load the data every
            # epoch and never be evaluated
            data[bank_key(name)] = MapDatasetLoader(ds, args.batch_size)

    return data
