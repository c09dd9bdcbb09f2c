from efgh_tpu.models.backbone import EFGHBackbone
from efgh_tpu.models.bcl import BilateralConvFlex
from efgh_tpu.models.enet import Enet
from efgh_tpu.models.fnet import Fnet
from efgh_tpu.models.gnet import Gnet
from efgh_tpu.models.hnet import Hnet
from efgh_tpu.models.resnet import (
    RESNET_PLANS,
    ResNet18Encoder,
    ResNet18Trunk,
    ResNetEncoder,
    ResNetTrunk,
)
from efgh_tpu.models.vgg import VGGFeatures, vgg11_bn, vgg11_bn_modified

# model registry, mirroring the reference's reflection-based construction
# (reference main.py:126: nets.__dict__[args['arch'] + 'Backbone'])
MODELS = {
    "EFGH": EFGHBackbone,
}


def build_model(cfg):
    from efgh_tpu.ops.lattice import set_merge_backend

    set_merge_backend(
        {"auto": None, "on": "pallas", "off": "sort"}[
            cfg.get("pallas_merge", "auto")
        ]
    )
    return MODELS[cfg.arch].from_config(cfg)
