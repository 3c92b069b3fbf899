#!/bin/bash
# Zero-shot classification eval (reference src/inference_classification.sh):
# ImageNet + the 10 extra datasets.
python -m cosmos_tpu.training.main \
    --model ViT-B-16 \
    --huggingface-model-name cosmos_vitb16_cc3m.pt \
    --huggingface-repo-name sankim2/cosmos \
    --cosmos --output-all --attentional-pool --add-zero-attn \
    --eval-mode classification \
    --imagenet-val datasets/imagenet/data/val_images \
    --classification-data-dir datasets/classification \
    --zeroshot-eval-datasets food101,cifar10,cifar100,sun397,stanford_car,aircraft,dtd,pets,flowers,caltech101 \
    "$@"
