#!/bin/bash
# ImageNet FLYP fine-tune — canonical paper recipe (myshells/run_all.sh, README.md:34):
# ViT-B/16, bs512, lr 1e-5, wd 0.1, 10 epochs, 6-way distribution-shift eval.
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=ImageNet --template=openai_imagenet_template \
  --eval-datasets=ImageNet,ImageNetV2,ImageNetR,ImageNetA,ImageNetSketch,ObjectNet \
  --model='ViT-B/16' --ft_data=datasets/csv/imagenet.csv \
  --data-location=datasets/data \
  --batch-size=512 --lr=1e-5 --wd=0.1 --epochs=10 --warmup_length=500 \
  --exp_name=flyp_imagenet --save=checkpoints/ "$@"
