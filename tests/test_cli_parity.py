"""Every documented reference command line must parse and resolve.

Command strings are the exact README invocations (`/root/reference/
README.md:34-113`, $vars substituted); each must parse through our flag
surface and resolve its datasets/templates/model name in the registries.
"""

import shlex

import pytest

from flyp_tpu.config import parse_arguments
from flyp_tpu.data.registry import get_classnames_for, get_dataset_class
from flyp_tpu.models.configs import resolve_model_name
from flyp_tpu.templates import get_template

README_COMMANDS = [
    # ImageNet FLYP (README.md:34)
    "--train-dataset=ImageNet --epochs=10 --lr=1e-5 --wd=0.1 --batch-size=512 --model=ViT-B/16 "
    "--eval-datasets=ImageNet,ImageNetV2,ImageNetR,ImageNetA,ImageNetSketch,ObjectNet "
    "--template=openai_imagenet_template --save=./checkpoints/ --data-location=./datasets/data/ "
    '--ft_data="./datasets/csv/imagenet.csv" --csv-img-key filepath --csv-caption-key title '
    "--exp_name=ImageNet/flyp_loss",
    # iWildCam (README.md:45)
    "--train-dataset=IWildCamIDVal --epochs=20 --lr=1e-5 --wd=0.2 --batch-size=256 --model=ViT-B/16 "
    "--eval-datasets=IWildCamIDVal,IWildCamID,IWildCamOOD --template=iwildcam_template "
    '--save=./checkpoints/ --data-location=./datasets/data/ --ft_data="./datasets/csv/iwildcam_v2.0/train.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=iwildcam/flyp_loss",
    # FMoW (README.md:54)
    "--train-dataset=FMOWIDVal --epochs=20 --lr=1e-5 --wd=0.2 --batch-size=256 --model=ViT-B/16 "
    "--eval-datasets=FMOWIDVal,FMOWID,FMOWOOD --template=fmow_template --save=./checkpoints/ "
    '--data-location=./datasets/data/ --ft_data="./datasets/csv/fmow.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=fmow/flyp_loss",
    # SST2 few-shot (README.md:68, $arch/$k substituted)
    "--train-dataset=sst2Val --epochs=20 --lr=1e-5 --wd=0.2 --batch-size=256 --model=ViT-B/16 "
    "--warmup_length 0 --eval-datasets=sst2Val,sst2Test --template=sst2_template --save=./checkpoints/ "
    '--data-location=./datasets/data/ --ft_data="./datasets/csv/sst2/train.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=sst2/flyp_loss_16shot --k=16",
    # PatchCamelyon few-shot (README.md:86)
    "--train-dataset=PatchCamelyonVal --epochs=20 --lr=1e-6 --wd=0.0 --batch-size=256 --model=ViT-B/16 "
    "--warmup_length 0 --eval-datasets=PatchCamelyonVal,PatchCamelyonTest --template=patchcamelyon_template "
    '--save=./checkpoints/ --data-location=./datasets/data/ --ft_data="./datasets/csv/patchcamelyon/train.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=patchcamelyon/flyp_loss_16shot --k=16",
    # Caltech-101 transfer (README.md:96)
    "--train-dataset=Caltech101Val --epochs=100 --lr=1e-5 --wd=0.0 --batch-size=256 --model=ViT-B/16 "
    "--warmup_length 500 --eval-datasets=Caltech101Val,Caltech101Test --template=caltech101_template "
    '--save=./checkpoints/ --data-location=./datasets/data/ --ft_data="./datasets/csv/caltech101/train.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=caltech101/flyp_loss",
    # StanfordCars transfer (README.md:106)
    "--train-dataset=StanfordCarsVal --epochs=100 --lr=1e-5 --wd=0.0 --batch-size=256 --model=ViT-B/16 "
    "--warmup_length 500 --eval-datasets=StanfordCarsVal,StanfordCarsTest --template=stanfordcars_template "
    '--save=./checkpoints/ --data-location=./datasets/data/ --ft_data="./datasets/csv/StanfordCars/train.csv" '
    "--csv-img-key filepath --csv-caption-key title --exp_name=stanfordcars/flyp_loss",
    # CE ablation (README.md:113)
    "--train-dataset=ImageNet --epochs=10 --lr=1e-5 --wd=0.1 --batch-size=512 --model=ViT-B/16 "
    "--eval-datasets=ImageNet,ImageNetV2,ImageNetR,ImageNetA,ImageNetSketch,ObjectNet "
    "--template=openai_imagenet_template --save=./checkpoints/ --data-location=./datasets/data/ "
    "--exp_name=ImageNet/ce_ablation --ce_ablation",
]


@pytest.mark.parametrize("command", README_COMMANDS, ids=lambda c: c.split("=", 2)[1].split(" ")[0])
def test_reference_command_parses_and_resolves(command):
    cfg = parse_arguments(shlex.split(command))
    assert cfg.model is not None
    resolve_model_name(cfg.model)
    get_template(cfg.template)
    get_dataset_class(cfg.train_dataset)
    get_classnames_for(cfg.train_dataset)
    for name in cfg.eval_datasets:
        get_dataset_class(name)
