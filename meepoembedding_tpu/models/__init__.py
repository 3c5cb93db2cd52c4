from meepoembedding_tpu.models.bst import BST  # noqa: F401
from meepoembedding_tpu.models.ctr_mlp import CtrMlp  # noqa: F401
from meepoembedding_tpu.models.dcn import DCNv2  # noqa: F401
from meepoembedding_tpu.models.deepfm import DeepFM  # noqa: F401
from meepoembedding_tpu.models.din import DIN  # noqa: F401
from meepoembedding_tpu.models.dlrm import DLRM  # noqa: F401
from meepoembedding_tpu.models.two_tower import TwoTower  # noqa: F401


def build_model(cfg):
    if cfg.kind == "dlrm":
        return DLRM(cfg)
    if cfg.kind == "ctr_mlp":
        return CtrMlp(cfg)
    if cfg.kind == "dcn":
        return DCNv2(cfg)
    if cfg.kind == "deepfm":
        return DeepFM(cfg)
    if cfg.kind == "two_tower":
        return TwoTower(cfg)
    if cfg.kind == "din":
        return DIN(cfg)
    if cfg.kind == "bst":
        return BST(cfg)
    raise ValueError(f"unknown model kind: {cfg.kind}")
