"""I/O: Kaldi ark/scp tables, RIFF wav."""

from .kaldi import (
    ArkScpWriter,
    open_or_fd,
    read_ali,
    read_mat,
    read_mat_ark,
    read_mat_scp,
    read_scp,
    read_vec_flt,
    read_vec_flt_ark,
    read_vec_flt_scp,
    read_vec_int,
    read_vec_int_ark,
    read_vec_int_scp,
    write_mat,
    write_vec_flt,
    write_vec_int,
)
from .wav import read_wav, write_wav
