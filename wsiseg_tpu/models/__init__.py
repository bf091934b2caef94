from wsiseg_tpu.models.resnet import ResNetEncoder, ENCODER_SPECS  # noqa: F401
from wsiseg_tpu.models.unet import UNetDecoder  # noqa: F401
from wsiseg_tpu.models.heads import Classifier, Regressor  # noqa: F401
from wsiseg_tpu.models.ynet import YNet, build_ynet  # noqa: F401
from wsiseg_tpu.models.ensemble import MultiPatchResNet  # noqa: F401
