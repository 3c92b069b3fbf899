#!/bin/bash
# Open-vocabulary segmentation eval (reference src/inference_segmentation.sh).
# Without background: voc20 cityscapes context59 ade20k coco_stuff;
# add --seg-w-background for voc21 context60 coco_object.
python -m cosmos_tpu.training.seg_eval \
    --model ViT-B-16 \
    --huggingface-model-name cosmos_vitb16_cc3m.pt \
    --huggingface-repo-name sankim2/cosmos \
    --use-csa \
    "$@"
