"""Flax model zoo: DFPN, CHN, CPN, VGG features, LPIPS (+ converters)."""

from master_thesis_tpu.models.chn import CHN, RRDB, RRDBNet, chn_infer_apply  # noqa: F401
from master_thesis_tpu.models.cpn import CPN  # noqa: F401
from master_thesis_tpu.models.dfpn import DFPN, correlation_masked_4d, dfpn_align  # noqa: F401
from master_thesis_tpu.models.lpips import LPIPS  # noqa: F401
from master_thesis_tpu.models.vgg import VGGFeatures  # noqa: F401
