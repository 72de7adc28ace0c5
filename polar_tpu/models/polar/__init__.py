from polar_tpu.models.polar.construction import (
    generate_5g_ranking,
    generate_ga_code,
    generate_rm_code,
    get_kern_frozen_bits,
    gen_arikan,
)
from polar_tpu.models.polar.encode import PolarEncoder, Polar5GEncoder
from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.hybrid import HybridSCLDecoder
from polar_tpu.models.polar.bp import PolarBPDecoder
from polar_tpu.models.polar.decode5g import Polar5GDecoder
from polar_tpu.models.polar.kernels import KERNELS, get_kernel
