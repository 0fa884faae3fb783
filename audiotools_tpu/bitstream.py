"""Bitstream engine: bit-granular readers and writers.

Re-design of the reference's table-driven C bitstream module
(``/root/reference/src/bitstream.c``, ``src/mod_bitstream.c``): same public
API — BitstreamReader / BitstreamWriter / BitstreamRecorder /
BitstreamAccumulator / HuffmanTree, with the ``parse()`` / ``build()``
mini-format-language ("16u 16u 24u 36U 16b", tokens u/s/U/S/p/P/b/a and a
``N*`` multiplier, reference ``src/bitstream.c:2905-2980``), per-byte
callbacks (for CRC taps), marks, and substreams — but implemented over
Python ints with a bit accumulator instead of generated jump tables.

This layer handles headers, metadata blocks, and acts as the correctness
oracle; bulk codec payloads move through the vectorized device kernels in
``audiotools_tpu.ops`` and never touch this class.

Endianness semantics (reference src/bitstream.py:16-60):
  big endian:    bits are packed MSB-first within each byte
  little endian: bits are packed LSB-first; in multi-bit values the
                 earlier-read bits are the least significant
"""

from __future__ import annotations

import io

__all__ = ["BitstreamReader", "BitstreamWriter", "BitstreamRecorder",
           "BitstreamAccumulator", "HuffmanTree", "parse_format",
           "format_size", "format_byte_size"]


def parse_format(format_string):
    """yields (times, size, instruction_char) triples from a format string

    instruction chars: 'u' unsigned, 's' signed, 'U' unsigned (long),
    'S' signed (long), 'p' skip bits, 'P' skip bytes, 'b' bytes, 'a' align
    """
    i = 0
    n = len(format_string)
    multiplier = 1
    while i < n:
        while i < n and format_string[i].isspace():
            i += 1
        if i == n:
            return
        argument = 0
        while i < n and format_string[i].isdigit():
            argument = argument * 10 + int(format_string[i])
            i += 1
        if i == n:
            return
        c = format_string[i]
        i += 1
        if c == '*':
            multiplier *= argument
            continue
        elif c == 'a':
            yield (multiplier, 0, 'a')
        elif c in "usUSpPb":
            yield (multiplier, argument, c)
        else:
            return
        multiplier = 1


def format_size(format_string):
    """returns the size of the given format string in bits"""
    total = 0
    for (times, size, inst) in parse_format(format_string):
        if inst in "usUSp":
            total += times * size
        elif inst in "Pb":
            total += times * size * 8
        elif inst == 'a':
            if total % 8:
                total += 8 - (total % 8)
    return total


def format_byte_size(format_string):
    """returns the size of the given format string in bytes"""
    return format_size(format_string) // 8


class HuffmanTree:
    """a compiled Huffman tree for read_huffman_code()

    built from a list of [bit_list, value] pairs, for example:
    >>> HuffmanTree([[1], 0, [0, 1], 1, [0, 0], 2], False)
    or the pair form [([1], 0), ([0, 1], 1), ([0, 0], 2)]
    """

    def __init__(self, *args):
        if len(args) == 2 and isinstance(args[0], (list, tuple)):
            (entries, little_endian) = args
        else:
            entries = args[0]
            little_endian = False
        # accept flat [bits, value, bits, value...] form
        items = []
        entries = list(entries)
        if (len(entries) and not
                (isinstance(entries[0], (list, tuple)) and
                 len(entries[0]) == 2 and
                 isinstance(entries[0][0], (list, tuple)))):
            for i in range(0, len(entries), 2):
                items.append((list(entries[i]), entries[i + 1]))
        else:
            items = [(list(bits), value) for (bits, value) in entries]

        self.little_endian = bool(little_endian)
        self.root = {}
        for (bits, value) in items:
            node = self.root
            for bit in bits[:-1]:
                node = node.setdefault(bit, {})
                if not isinstance(node, dict):
                    raise ValueError("Huffman code prefix collision")
            last = bits[-1]
            if last in node:
                raise ValueError("duplicate Huffman code")
            node[last] = ("leaf", value)


class _ByteSource:
    """seekable byte-granular source over a file object or bytes"""

    def __init__(self, obj):
        if isinstance(obj, (bytes, bytearray, memoryview)):
            self.file = io.BytesIO(bytes(obj))
        else:
            self.file = obj

    def read(self, n):
        return self.file.read(n)

    def tell(self):
        return self.file.tell()

    def seek(self, pos):
        self.file.seek(pos, 0)

    def append(self, data):
        """appends bytes to the END of the underlying stream
        (in-memory sources only; used by substream_append)"""
        pos = self.file.tell()
        self.file.seek(0, 2)
        self.file.write(data)
        self.file.seek(pos, 0)

    def close(self):
        try:
            self.file.close()
        except AttributeError:
            pass


class BitstreamReader:
    """reads bit-granular values from a file object or bytes"""

    def __init__(self, source, little_endian=False, buffer_size=4096):
        self.source = _ByteSource(source)
        self.little_endian = bool(little_endian)
        self.state = 0          # current partial byte (int)
        self.state_bits = 0     # bits remaining in partial byte
        self.callbacks = []
        self.callbacks_popped = []
        self.marks = []

    # --- internals -------------------------------------------------------
    def _next_byte(self):
        b = self.source.read(1)
        if len(b) == 0:
            raise IOError("I/O error reading stream")
        byte = b[0]
        for callback in self.callbacks:
            callback(byte)
        return byte

    # --- endianness ------------------------------------------------------
    def set_endianness(self, little_endian):
        """sets the endianness; discards any partial byte state"""
        self.little_endian = bool(little_endian)
        self.state = 0
        self.state_bits = 0

    # --- reads -----------------------------------------------------------
    def read(self, bits):
        """reads an unsigned value of the given number of bits"""
        if bits < 0:
            raise ValueError("bit count must be >= 0")
        if self.little_endian:
            value = 0
            shift = 0
            remaining = bits
            while remaining > 0:
                if self.state_bits == 0:
                    self.state = self._next_byte()
                    self.state_bits = 8
                take = min(remaining, self.state_bits)
                value |= (self.state & ((1 << take) - 1)) << shift
                self.state >>= take
                self.state_bits -= take
                shift += take
                remaining -= take
            return value
        else:
            value = 0
            remaining = bits
            while remaining > 0:
                if self.state_bits == 0:
                    self.state = self._next_byte()
                    self.state_bits = 8
                take = min(remaining, self.state_bits)
                chunk = (self.state >> (self.state_bits - take)) & \
                    ((1 << take) - 1)
                value = (value << take) | chunk
                self.state_bits -= take
                self.state &= (1 << self.state_bits) - 1
                remaining -= take
            return value

    def read_signed(self, bits):
        """reads a signed two's-complement value of the given bits"""
        if bits < 1:
            raise ValueError("signed reads need at least 1 bit")
        value = self.read(bits)
        if value & (1 << (bits - 1)):
            return value - (1 << bits)
        return value

    # 64-bit variants are aliases: Python ints are arbitrary precision
    read_64 = read
    read_signed_64 = read_signed
    read_bigint = read
    read_signed_bigint = read_signed

    def skip(self, bits):
        """skips the given number of bits"""
        self.read(bits)

    def skip_bytes(self, byte_count):
        """skips the given number of bytes"""
        # byte-aligned skips on seekable sources avoid reading,
        # but callbacks require actually consuming the bytes
        if self.state_bits == 0 and not self.callbacks:
            self.source.seek(self.source.tell() + byte_count)
        else:
            chunk = 0x10000
            while byte_count > 0:
                n = min(byte_count, chunk)
                self.read_bytes(n)
                byte_count -= n

    def unary(self, stop_bit):
        """counts bits before the next stop bit (0 or 1)"""
        if stop_bit not in (0, 1):
            raise ValueError("stop bit must be 0 or 1")
        count = 0
        while True:
            if self.state_bits == 0:
                self.state = self._next_byte()
                self.state_bits = 8
            if self.little_endian:
                bit = self.state & 1
                self.state >>= 1
            else:
                bit = (self.state >> (self.state_bits - 1)) & 1
            self.state_bits -= 1
            if not self.little_endian:
                self.state &= (1 << self.state_bits) - 1
            if bit == stop_bit:
                return count
            count += 1

    def limited_unary(self, stop_bit, maximum_bits):
        """counts bits before the next stop bit, up to a maximum

        returns the count, or None if maximum_bits is exceeded"""
        if stop_bit not in (0, 1):
            raise ValueError("stop bit must be 0 or 1")
        count = 0
        while count < maximum_bits:
            if self.state_bits == 0:
                self.state = self._next_byte()
                self.state_bits = 8
            if self.little_endian:
                bit = self.state & 1
                self.state >>= 1
            else:
                bit = (self.state >> (self.state_bits - 1)) & 1
            self.state_bits -= 1
            if not self.little_endian:
                self.state &= (1 << self.state_bits) - 1
            if bit == stop_bit:
                return count
            count += 1
        return None

    def read_huffman_code(self, tree):
        """reads a Huffman code from the stream using a HuffmanTree"""
        node = tree.root
        while True:
            if self.state_bits == 0:
                self.state = self._next_byte()
                self.state_bits = 8
            if self.little_endian:
                bit = self.state & 1
                self.state >>= 1
            else:
                bit = (self.state >> (self.state_bits - 1)) & 1
            self.state_bits -= 1
            if not self.little_endian:
                self.state &= (1 << self.state_bits) - 1
            try:
                node = node[bit]
            except KeyError:
                raise ValueError("invalid Huffman code in stream")
            if not isinstance(node, dict):
                return node[1]

    def read_bytes(self, byte_count):
        """reads the given number of bytes as a bytes object"""
        if self.state_bits == 0:
            data = self.source.read(byte_count)
            if len(data) != byte_count:
                raise IOError("I/O error reading stream")
            for callback in self.callbacks:
                for byte in data:
                    callback(byte)
            return data
        else:
            return bytes(self.read(8) for _ in range(byte_count))

    def byte_align(self):
        """discards partial-byte state, moving to the next byte boundary"""
        self.state = 0
        self.state_bits = 0

    def byte_aligned(self):
        """returns True if the stream is at a byte boundary"""
        return self.state_bits == 0

    def parse(self, format_string):
        """reads the format string, returning a list of values"""
        values = []
        for (times, size, inst) in parse_format(format_string):
            for _ in range(times):
                if inst in ('u', 'U'):
                    values.append(self.read(size))
                elif inst in ('s', 'S'):
                    values.append(self.read_signed(size))
                elif inst == 'p':
                    self.skip(size)
                elif inst == 'P':
                    self.skip_bytes(size)
                elif inst == 'b':
                    values.append(self.read_bytes(size))
                elif inst == 'a':
                    self.byte_align()
        return values

    def substream(self, byte_count):
        """returns a BitstreamReader over the next byte_count bytes"""
        return BitstreamReader(self.read_bytes(byte_count),
                               self.little_endian)

    def substream_append(self, substream, byte_count):
        """appends byte_count further bytes from this stream to the
        given substream (reference mod_bitstream.h:273)"""
        substream.source.append(self.read_bytes(byte_count))

    def skip_unary(self, stop_bit):
        """skips bits up to and including the next stop bit
        (reference mod_bitstream.c:417)"""
        self.unary(stop_bit)

    def unread(self, bit):
        """pushes one bit back into the stream
        (reference mod_bitstream.h:208); it becomes the next bit
        read.  Only whole-byte capacity exists, so unreading is
        valid only when fewer than 8 bits of the current byte
        remain (the same restriction as the reference)"""
        if bit not in (0, 1):
            raise ValueError("unread bit must be 0 or 1")
        if self.state_bits >= 8:
            raise IOError("maximum unread bits reached")
        if self.little_endian:
            # next LE read takes the low bit of state
            self.state = (self.state << 1) | bit
            self.state_bits += 1
        else:
            # next BE read takes bit (state_bits - 1); push above it
            self.state |= bit << self.state_bits
            self.state_bits += 1

    # --- callbacks -------------------------------------------------------
    def add_callback(self, callback):
        """adds a per-byte callback (called with each byte read)"""
        self.callbacks.append(callback)

    def pop_callback(self):
        """removes and returns the most recently added callback"""
        callback = self.callbacks.pop()
        self.callbacks_popped.append(callback)
        return callback

    def push_callback(self, callback=None):
        """restores the most recently popped callback"""
        if callback is None:
            callback = self.callbacks_popped.pop()
        self.callbacks.append(callback)

    def call_callbacks(self, byte):
        """explicitly passes a byte to all current callbacks"""
        for callback in self.callbacks:
            callback(byte)

    # --- marks -----------------------------------------------------------
    def mark(self):
        """pushes the current position onto the mark stack"""
        self.marks.append((self.source.tell(), self.state, self.state_bits))

    def rewind(self):
        """rewinds to the most recent mark (which stays on the stack)"""
        (pos, state, state_bits) = self.marks[-1]
        self.source.seek(pos)
        self.state = state
        self.state_bits = state_bits

    def unmark(self):
        """pops the most recent mark without rewinding"""
        self.marks.pop()

    def getpos(self):
        return (self.source.tell(), self.state, self.state_bits)

    def setpos(self, pos):
        (p, state, state_bits) = pos
        self.source.seek(p)
        self.state = state
        self.state_bits = state_bits

    def seek(self, position, whence=0):
        """seeks to a byte-aligned position in the stream"""
        if whence == 0:
            self.source.seek(position)
        elif whence == 1:
            self.source.seek(self.source.tell() + position)
        else:
            self.source.file.seek(position, 2)
        self.state = 0
        self.state_bits = 0

    def close(self):
        self.source.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _WriterCore:
    """shared bit-accumulation logic for writers/recorders"""

    def __init__(self, little_endian=False):
        self.little_endian = bool(little_endian)
        self.state = 0
        self.state_bits = 0
        self.callbacks = []
        self.callbacks_popped = []
        self._bits_written = 0

    def _emit_byte(self, byte):
        raise NotImplementedError()

    def write(self, bits, value):
        """writes an unsigned value of the given number of bits"""
        if bits < 0:
            raise ValueError("bit count must be >= 0")
        if value < 0 or (bits < 64 and value >= (1 << bits)):
            if value >= (1 << bits):
                raise ValueError("value does not fit in bit count")
            raise ValueError("value must be unsigned")
        self._bits_written += bits
        if self.little_endian:
            remaining = bits
            while remaining > 0:
                take = min(remaining, 8 - self.state_bits)
                chunk = value & ((1 << take) - 1)
                self.state |= chunk << self.state_bits
                self.state_bits += take
                value >>= take
                remaining -= take
                if self.state_bits == 8:
                    self._flush_state_byte()
        else:
            remaining = bits
            while remaining > 0:
                take = min(remaining, 8 - self.state_bits)
                chunk = (value >> (remaining - take)) & ((1 << take) - 1)
                self.state = (self.state << take) | chunk
                self.state_bits += take
                remaining -= take
                if self.state_bits == 8:
                    self._flush_state_byte()

    def _flush_state_byte(self):
        byte = self.state & 0xFF
        for callback in self.callbacks:
            callback(byte)
        self._emit_byte(byte)
        self.state = 0
        self.state_bits = 0

    def write_signed(self, bits, value):
        """writes a signed two's-complement value of the given bits"""
        if bits < 1:
            raise ValueError("signed writes need at least 1 bit")
        limit = 1 << (bits - 1)
        if not (-limit <= value < limit):
            raise ValueError("value does not fit in bit count")
        self.write(bits, value + (1 << bits) if value < 0 else value)

    write_64 = write
    write_signed_64 = write_signed
    write_bigint = write
    write_signed_bigint = write_signed

    def unary(self, stop_bit, value):
        """writes value non-stop bits followed by one stop bit"""
        if stop_bit not in (0, 1):
            raise ValueError("stop bit must be 0 or 1")
        if value < 0:
            raise ValueError("unary value must be >= 0")
        if stop_bit:
            # value 0 bits then a 1 bit
            while value >= 32:
                self.write(32, 0)
                value -= 32
            if self.little_endian:
                self.write(value + 1, 1 << value)
            else:
                self.write(value + 1, 1)
        else:
            # value 1 bits then a 0 bit
            while value >= 32:
                self.write(32, 0xFFFFFFFF)
                value -= 32
            if self.little_endian:
                self.write(value + 1, (1 << value) - 1)
            else:
                self.write(value + 1, ((1 << value) - 1) << 1)

    def write_bytes(self, data):
        """writes a bytes object to the stream"""
        if isinstance(data, str):
            data = data.encode("ascii")
        if self.state_bits == 0:
            for callback in self.callbacks:
                for byte in data:
                    callback(byte)
            self._bits_written += 8 * len(data)
            self._emit_bytes(data)
        else:
            for byte in data:
                self.write(8, byte)

    def _emit_bytes(self, data):
        for byte in data:
            self._emit_byte(byte)

    def byte_align(self):
        """pads the stream with 0 bits to the next byte boundary"""
        if self.state_bits:
            self.write(8 - self.state_bits, 0)

    def byte_aligned(self):
        return self.state_bits == 0

    def build(self, format_string, values):
        """writes the format string using an iterable of values"""
        values = list(values)
        values.reverse()
        for (times, size, inst) in parse_format(format_string):
            for _ in range(times):
                if inst in ('u', 'U'):
                    self.write(size, values.pop())
                elif inst in ('s', 'S'):
                    self.write_signed(size, values.pop())
                elif inst == 'p':
                    self.write(size, 0)
                elif inst == 'P':
                    self.write_bytes(b"\x00" * size)
                elif inst == 'b':
                    self.write_bytes(values.pop())
                elif inst == 'a':
                    self.byte_align()

    def write_huffman_code(self, tree, value):
        """writes the Huffman code for the given value"""
        def find(node, path):
            if not isinstance(node, dict):
                return path if node[1] == value else None
            for (bit, child) in node.items():
                result = find(child, path + [bit])
                if result is not None:
                    return result
            return None
        path = find(tree.root, [])
        if path is None:
            raise ValueError("value has no Huffman code")
        for bit in path:
            self.write(1, bit)

    # --- callbacks -------------------------------------------------------
    def add_callback(self, callback):
        self.callbacks.append(callback)

    def pop_callback(self):
        callback = self.callbacks.pop()
        self.callbacks_popped.append(callback)
        return callback

    def push_callback(self, callback=None):
        if callback is None:
            callback = self.callbacks_popped.pop()
        self.callbacks.append(callback)

    def call_callbacks(self, byte):
        for callback in self.callbacks:
            callback(byte)


class BitstreamWriter(_WriterCore):
    """writes bit-granular values to a file object"""

    def __init__(self, file, little_endian=False, buffer_size=4096):
        super().__init__(little_endian)
        self.file = file
        self._pending = bytearray()

    def _emit_byte(self, byte):
        self._pending.append(byte)
        if len(self._pending) >= 4096:
            self.file.write(bytes(self._pending))
            self._pending.clear()

    def _emit_bytes(self, data):
        self._pending.extend(data)
        if len(self._pending) >= 4096:
            self.file.write(bytes(self._pending))
            self._pending.clear()

    def set_endianness(self, little_endian):
        self.byte_align()
        self.little_endian = bool(little_endian)

    def flush(self):
        """flushes pending whole bytes to the file"""
        if self._pending:
            self.file.write(bytes(self._pending))
            self._pending.clear()
        try:
            self.file.flush()
        except AttributeError:
            pass

    def seek(self, position, whence=0):
        """flushes and seeks the underlying file (byte-aligned)"""
        self.flush()
        self.file.seek(position, whence)

    def close(self):
        self.byte_align()
        self.flush()
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.byte_align()
        self.flush()


class BitstreamRecorder(_WriterCore):
    """an in-memory BitstreamWriter which can be copied to another writer"""

    def __init__(self, little_endian=False):
        super().__init__(little_endian)
        self._bytes = bytearray()

    def _emit_byte(self, byte):
        self._bytes.append(byte)

    def _emit_bytes(self, data):
        self._bytes.extend(data)

    def bits(self):
        """returns the number of bits written so far"""
        return self._bits_written

    def bytes(self):
        """returns the number of whole bytes written so far"""
        return self._bits_written // 8

    def data(self):
        """returns the recorded whole bytes as a bytes object"""
        return bytes(self._bytes)

    def reset(self):
        """clears all recorded data"""
        self._bytes.clear()
        self.state = 0
        self.state_bits = 0
        self._bits_written = 0

    def split(self, target, remainder, byte_count):
        """copies the first byte_count recorded bytes to target and
        the rest to remainder (either may be None)
        (reference mod_bitstream.h:757); returns byte_count"""
        head = bytes(self._bytes[:byte_count])
        tail = bytes(self._bytes[byte_count:])
        if target is not None:
            target.write_bytes(head)
        if remainder is not None:
            remainder.write_bytes(tail)
        return len(head)

    def copy(self, writer):
        """writes our recorded data to another writer"""
        writer.write_bytes(bytes(self._bytes))
        if self.state_bits:
            if self.little_endian:
                writer.write(self.state_bits, self.state)
            else:
                writer.write(self.state_bits, self.state)

    def set_endianness(self, little_endian):
        self.little_endian = bool(little_endian)
        self.reset()

    def swap(self, other):
        """swaps recorded contents with another BitstreamRecorder"""
        (self._bytes, other._bytes) = (other._bytes, self._bytes)
        (self.state, other.state) = (other.state, self.state)
        (self.state_bits, other.state_bits) = \
            (other.state_bits, self.state_bits)
        (self._bits_written, other._bits_written) = \
            (other._bits_written, self._bits_written)

    def close(self):
        pass


class BitstreamAccumulator(_WriterCore):
    """a BitstreamWriter which only counts the bits written"""

    def __init__(self, little_endian=False):
        super().__init__(little_endian)

    def _emit_byte(self, byte):
        pass

    def _emit_bytes(self, data):
        pass

    # accumulation doesn't need per-byte callback dispatch; avoid the
    # byte-assembly overhead entirely by overriding write()
    def write(self, bits, value):
        if bits < 0:
            raise ValueError("bit count must be >= 0")
        if value < 0:
            raise ValueError("value must be unsigned")
        self._bits_written += bits
        # track bit alignment for byte_align()
        self.state_bits = (self.state_bits + bits) % 8

    def write_signed(self, bits, value):
        limit = 1 << (bits - 1)
        if not (-limit <= value < limit):
            raise ValueError("value does not fit in bit count")
        self._bits_written += bits
        self.state_bits = (self.state_bits + bits) % 8

    write_64 = write
    write_signed_64 = write_signed

    def write_bytes(self, data):
        self._bits_written += 8 * len(data)

    def byte_align(self):
        if self.state_bits:
            self._bits_written += 8 - self.state_bits
            self.state_bits = 0

    def bits(self):
        return self._bits_written

    def bytes(self):
        return self._bits_written // 8

    def reset(self):
        self._bits_written = 0
        self.state_bits = 0

    def set_endianness(self, little_endian):
        self.little_endian = bool(little_endian)
        self.reset()

    def close(self):
        pass
