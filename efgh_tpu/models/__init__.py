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
    # The merge backend is process-global (efgh_tpu/ops/lattice.py) and
    # baked into traces at trace time: build_model must run (and the value
    # must be final) BEFORE the model is first jitted; later changes do not
    # invalidate jit caches.  Building two models with different
    # `pallas_merge` settings in one process is unsupported — last wins.
    from efgh_tpu.ops.lattice import _merge_backend, set_merge_backend

    raw = cfg.get("pallas_merge", "auto")
    # unquoted YAML `on`/`off` parse as Python bools; accept them
    if raw is True:
        raw = "on"
    elif raw is False:
        raw = "off"
    modes = {"auto": None, "on": "pallas", "off": "sort"}
    if raw not in modes:
        raise ValueError(
            f"pallas_merge must be one of {sorted(modes)} (got {raw!r}); "
            "quote the value in YAML — bare on/off parse as booleans"
        )
    set_merge_backend(modes[raw])
    # resolve "auto" eagerly (probe on TPU hosts) so the choice is pinned
    # before any tracing, not mid-trace
    _merge_backend()

    # same dance for the BCL blur-gather kernel (default off)
    from efgh_tpu.ops.lattice import set_bcl_gather_backend

    raw_bcl = cfg.get("pallas_bcl", "off")
    if raw_bcl is True:
        raw_bcl = "on"
    elif raw_bcl is False:
        raw_bcl = "off"
    if raw_bcl == "auto":
        from efgh_tpu.ops.bcl_probe import resolve_bcl_auto_backend

        set_bcl_gather_backend(resolve_bcl_auto_backend())
    elif raw_bcl in ("on", "off"):
        set_bcl_gather_backend("pallas" if raw_bcl == "on" else "xla")
    else:
        raise ValueError(
            f"pallas_bcl must be auto|on|off (got {raw_bcl!r}); quote the "
            "value in YAML — bare on/off parse as booleans")
    return MODELS[cfg.arch].from_config(cfg)
