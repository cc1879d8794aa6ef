from .npy import npy_serialize, npy_deserialize, save_npy, load_npy
from .b64 import b64_encode, b64_decode
from .istr import istr_stringify, istr_parse
from .pyon import pyon_parse

__all__ = ["npy_serialize", "npy_deserialize", "save_npy", "load_npy",
           "b64_encode", "b64_decode", "istr_stringify", "istr_parse",
           "pyon_parse"]

IS_LITTLE_ENDIAN = True  # ref: io/index.js:19 (numpy handles both)
