from .morton import morton3_21, zcode_from_columns
from .phash import phash64
from .psnr import psnr
