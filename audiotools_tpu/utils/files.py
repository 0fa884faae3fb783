"""Atomic file helpers.

Rebuild of TemporaryFile (reference ``audiotools/__init__.py:5551``,
atomic in-place rewrite via write-temp-then-rename preserving mode) and
make_dirs (:2928).
"""

from __future__ import annotations

import os


class TemporaryFile:
    """a file-like object for atomically replacing a file's contents

    writes go to a temporary file in the same directory; close()
    renames it over the final name, preserving the original mode
    """

    def __init__(self, final_filename):
        from tempfile import mkstemp

        self.__final_filename__ = final_filename
        try:
            self.__final_mode__ = os.stat(final_filename).st_mode
        except OSError:
            self.__final_mode__ = None

        (handle, self.__temp_filename__) = mkstemp(
            prefix="." + os.path.basename(final_filename) + "-",
            dir=os.path.dirname(final_filename) or ".")
        self.__file__ = os.fdopen(handle, "wb")

    def __del__(self):
        if ((self.__temp_filename__ is not None) and
                os.path.isfile(self.__temp_filename__)):
            os.unlink(self.__temp_filename__)
            self.__temp_filename__ = None

    def write(self, data):
        return self.__file__.write(data)

    def flush(self):
        self.__file__.flush()

    def tell(self):
        return self.__file__.tell()

    def seek(self, offset, whence=0):
        return self.__file__.seek(offset, whence)

    def close(self):
        self.__file__.close()
        os.rename(self.__temp_filename__, self.__final_filename__)
        if self.__final_mode__ is not None:
            os.chmod(self.__final_filename__, self.__final_mode__)
        self.__temp_filename__ = None


def make_dirs(destination_path):
    """ensures all directories leading to destination_path are created"""
    dirname = os.path.dirname(destination_path)
    if (dirname != '') and (not os.path.isdir(dirname)):
        os.makedirs(dirname, exist_ok=True)
