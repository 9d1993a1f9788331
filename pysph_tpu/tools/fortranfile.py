"""Reader for unformatted sequential Fortran files (parity with
/root/reference/pysph/tools/fortranfile.py, itself a standard
record-marker reader).  Each record is [length][payload][length]."""

import struct

import numpy as np


class FortranFile(object):
    def __init__(self, fname, endian='<', header_length=4):
        self.ENDIAN = endian
        self._header_length = header_length
        self._fp = open(fname, 'rb')

    def close(self):
        self._fp.close()

    def _read_exactly(self, num_bytes):
        data = b''
        while True:
            chunk = self._fp.read(num_bytes - len(data))
            if not chunk:
                raise IOError('could not read %d bytes' % num_bytes)
            data += chunk
            if len(data) == num_bytes:
                return data

    def _read_check(self):
        fmt = self.ENDIAN + ('i' if self._header_length == 4
                             else 'q')
        return struct.unpack(fmt, self._read_exactly(
            self._header_length))[0]

    def _write_check(self, length):
        fmt = self.ENDIAN + ('i' if self._header_length == 4
                             else 'q')
        self._fp.write(struct.pack(fmt, length))

    def read_record(self):
        """One complete record's payload bytes."""
        length = self._read_check()
        data = self._read_exactly(length)
        check = self._read_check()
        if check != length:
            raise IOError('record markers do not match (%d != %d)'
                          % (length, check))
        return data

    def read_reals(self, dtype='f8'):
        data = self.read_record()
        return np.frombuffer(data,
                             dtype=self.ENDIAN + dtype).copy()

    def read_ints(self, dtype='i4'):
        data = self.read_record()
        return np.frombuffer(data,
                             dtype=self.ENDIAN + dtype).copy()

    def read_string(self):
        return self.read_record().decode('latin1')
