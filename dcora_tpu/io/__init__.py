from dcora_tpu.io.g2o import read_g2o_file
from dcora_tpu.io.pyfg import read_pyfg_file

__all__ = ["read_g2o_file", "read_pyfg_file"]
