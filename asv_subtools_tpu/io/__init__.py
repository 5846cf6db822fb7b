"""I/O: Kaldi ark/scp tables, RIFF wav."""

from .kaldi import (
    ArkScpWriter,
    open_or_fd,
    read_mat,
    read_mat_ark,
    read_mat_scp,
    read_scp,
    read_vec_flt,
    read_vec_flt_ark,
    read_vec_flt_scp,
    write_mat,
    write_vec_flt,
)
from .wav import read_wav, write_wav
