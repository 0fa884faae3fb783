"""PCM stream algebra: the PCMReader protocol and composable wrappers.

Python-3-native rebuild of the reference's pure-Python stream layer
(``/root/reference/audiotools/__init__.py``): PCMReader (:2063),
PCMReaderError (:2133), PCMReaderProgress (:2167), ReorderedPCMReader
(:2194), RemaskedPCMReader (:2239), pcm_cmp (:2384), pcm_frame_cmp (:2445),
PCMCat (:2487), BufferedPCMReader (:2561), CounterPCMReader (:2608),
LimitedPCMReader (:2656), pcm_split (:2689), PCMConverter (:2729),
PCMReaderWindow (:4842), ChannelMask (:1862).

The protocol is unchanged: any object with sample_rate / channels /
channel_mask / bits_per_sample attributes plus read(pcm_frames)->FrameList
(empty == EOF) and close().  Internally, wrappers operate on the NumPy
[frames, channels] arrays inside FrameList instead of per-sample loops.
"""

from __future__ import annotations

import numpy as np

from . import pcm

# default size of all read() calls in frames
# (reference audiotools/__init__.py:94)
FRAMELIST_SIZE = 0x100000 // 4

BUFFER_SIZE = 0x100000


class ChannelMask:
    """an integer-like class that abstracts channel assignments

    all channels in a FrameList are in RIFF WAVE order; this mask says
    which speaker each channel index corresponds to (reading set bits
    from least significant upward).  A mask of 0 is "undefined".
    """

    SPEAKER_TO_MASK = {"front_left": 0x1,
                       "front_right": 0x2,
                       "front_center": 0x4,
                       "low_frequency": 0x8,
                       "back_left": 0x10,
                       "back_right": 0x20,
                       "front_left_of_center": 0x40,
                       "front_right_of_center": 0x80,
                       "back_center": 0x100,
                       "side_left": 0x200,
                       "side_right": 0x400,
                       "top_center": 0x800,
                       "top_front_left": 0x1000,
                       "top_front_center": 0x2000,
                       "top_front_right": 0x4000,
                       "top_back_left": 0x8000,
                       "top_back_center": 0x10000,
                       "top_back_right": 0x20000}

    MASK_TO_SPEAKER = {v: k for (k, v) in SPEAKER_TO_MASK.items()}

    @classmethod
    def _speaker_labels(cls):
        """attribute name -> translatable display label (text.MASK_*);
        built lazily so importing pcmstream never requires text"""
        labels = getattr(cls, "_speaker_labels_cache", None)
        if labels is None:
            from . import text
            labels = {field: getattr(text, "MASK_" + field.upper(),
                                     field)
                      for field in cls.SPEAKER_TO_MASK}
            labels["low_frequency"] = text.MASK_LFE
            cls._speaker_labels_cache = labels
        return labels

    def __init__(self, mask):
        mask = int(mask)
        for (speaker, speaker_mask) in self.SPEAKER_TO_MASK.items():
            setattr(self, speaker, (mask & speaker_mask) != 0)

    def __repr__(self):
        return "ChannelMask(%s)" % \
            ",".join(["%s=%s" % (field, getattr(self, field))
                      for field in self.SPEAKER_TO_MASK.keys()
                      if getattr(self, field)])

    def __str__(self):
        labels = self._speaker_labels()
        return ", ".join([labels[self.MASK_TO_SPEAKER[key]] for key in
                          sorted(self.MASK_TO_SPEAKER.keys())
                          if getattr(self, self.MASK_TO_SPEAKER[key])])

    def __int__(self):
        return sum(mask for (field, mask) in self.SPEAKER_TO_MASK.items()
                   if getattr(self, field))

    def __index__(self):
        return int(self)

    def __eq__(self, v):
        return int(self) == int(v)

    def __ne__(self, v):
        return int(self) != int(v)

    def __hash__(self):
        return hash(int(self))

    def __len__(self):
        return sum(1 for field in self.SPEAKER_TO_MASK
                   if getattr(self, field))

    def defined(self):
        """returns True if this ChannelMask is defined"""
        return int(self) != 0

    def undefined(self):
        """returns True if this ChannelMask is undefined"""
        return int(self) == 0

    def channels(self):
        """returns speaker strings in stream order"""
        return [speaker for (mask, speaker)
                in sorted(self.MASK_TO_SPEAKER.items())
                if getattr(self, speaker)]

    def index(self, channel_name):
        """returns the index of the named channel within this mask"""
        return self.channels().index(channel_name)

    @classmethod
    def from_fields(cls, **fields):
        """builds a ChannelMask from speaker=True/False keywords"""
        mask = cls(0)
        for (key, value) in fields.items():
            if key in cls.SPEAKER_TO_MASK:
                setattr(mask, key, bool(value))
            else:
                raise KeyError(key)
        return mask

    @classmethod
    def from_channels(cls, channel_count):
        """builds a ChannelMask from a channel count (1 or 2 only)"""
        if channel_count == 2:
            return cls(0x3)
        elif channel_count == 1:
            return cls(0x4)
        else:
            raise ValueError("ambiguous channel assignment")


class PCMReader:
    """wraps a file of raw PCM data and generates pcm.FrameList objects"""

    def __init__(self, file,
                 sample_rate, channels, channel_mask, bits_per_sample,
                 process=None, signed=True, big_endian=False):
        self.file = file
        self.sample_rate = sample_rate
        self.channels = channels
        self.channel_mask = channel_mask
        self.bits_per_sample = bits_per_sample
        self.process = process
        self.signed = signed
        self.big_endian = big_endian
        self.bytes_per_frame = self.channels * (self.bits_per_sample // 8)

    def read(self, pcm_frames):
        """try to read the given number of PCM frames; empty == EOF"""
        data = self.file.read(max(pcm_frames, 1) * self.bytes_per_frame)
        # trim any trailing partial frame
        data = data[:len(data) - (len(data) % self.bytes_per_frame)]
        framelist = pcm.FrameList(data,
                                  self.channels,
                                  self.bits_per_sample,
                                  self.big_endian,
                                  self.signed)
        if framelist.frames > 0:
            return framelist
        elif self.process is not None:
            process, self.process = self.process, None
            if process.wait() == 0:
                return framelist
            else:
                raise ValueError("subprocess exited with error")
        else:
            return framelist

    def seek(self, pcm_frame):
        """seeks to the given PCM frame in the raw stream

        returns the position actually seeked to; requires a seekable
        source file (raw PCM containers: byte offset = frame index *
        bytes per frame)"""
        pcm_frame = max(int(pcm_frame), 0)
        try:
            byte_offset = self.file.seek(pcm_frame *
                                         self.bytes_per_frame)
        except (IOError, OSError, AttributeError):
            raise IOError("stream is not seekable")
        return byte_offset // self.bytes_per_frame

    def close(self):
        self.file.close()


class PCMReaderError:
    """a dummy PCMReader which raises ValueError on read"""

    def __init__(self, error_message,
                 sample_rate, channels, channel_mask, bits_per_sample):
        self.sample_rate = sample_rate
        self.channels = channels
        self.channel_mask = channel_mask
        self.bits_per_sample = bits_per_sample
        self.error_message = error_message

    def read(self, pcm_frames):
        raise ValueError(self.error_message)

    def close(self):
        pass


class PCMReaderProgress:
    """a PCMReader wrapper which invokes progress(current, total)"""

    def __init__(self, pcmreader, total_frames, progress, current_frames=0):
        self.__read__ = pcmreader.read
        self.__close__ = pcmreader.close
        self.sample_rate = pcmreader.sample_rate
        self.channels = pcmreader.channels
        self.channel_mask = pcmreader.channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample
        self.current_frames = current_frames
        self.total_frames = total_frames
        self.progress = progress

    def read(self, pcm_frames):
        frame = self.__read__(pcm_frames)
        self.current_frames += frame.frames
        if self.progress is not None:
            self.progress(self.current_frames, self.total_frames)
        return frame

    def close(self):
        self.__close__()


def to_pcm_progress(audiofile, progress):
    if progress is None:
        return audiofile.to_pcm()
    else:
        return PCMReaderProgress(audiofile.to_pcm(),
                                 audiofile.total_frames(),
                                 progress)


class ReorderedPCMReader:
    """a PCMReader wrapper which reorders its output channels"""

    def __init__(self, pcmreader, channel_order, channel_mask=None):
        self.pcmreader = pcmreader
        self.sample_rate = pcmreader.sample_rate
        self.channels = len(channel_order)
        if channel_mask is None:
            self.channel_mask = pcmreader.channel_mask
        else:
            self.channel_mask = channel_mask
        if ((self.channel_mask != 0) and
                (len(ChannelMask(self.channel_mask)) != self.channels)):
            raise ValueError("channel count and mask mismatch")
        self.bits_per_sample = pcmreader.bits_per_sample
        self.channel_order = list(channel_order)

    def read(self, pcm_frames):
        framelist = self.pcmreader.read(pcm_frames)
        return pcm.FrameList._wrap(
            framelist.samples[:, self.channel_order],
            framelist.bits_per_sample)

    def close(self):
        self.pcmreader.close()


class RemaskedPCMReader:
    """a PCMReader wrapper which changes the channel count and mask"""

    def __init__(self, pcmreader, channel_count, channel_mask):
        self.pcmreader = pcmreader
        self.sample_rate = pcmreader.sample_rate
        self.channels = channel_count
        self.channel_mask = channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample

        if (pcmreader.channel_mask != 0) and (channel_mask != 0):
            mask = ChannelMask(channel_mask)
            if len(mask) != channel_count:
                raise ValueError("channel count and mask mismatch")
            reader_channels = ChannelMask(pcmreader.channel_mask).channels()
            self.__channels__ = [(reader_channels.index(c)
                                  if c in reader_channels else None)
                                 for c in mask.channels()]
        else:
            if channel_count <= pcmreader.channels:
                self.__channels__ = list(range(channel_count))
            else:
                self.__channels__ = (list(range(pcmreader.channels)) +
                                     [None] * (channel_count -
                                               pcmreader.channels))

    def read(self, pcm_frames):
        frame = self.pcmreader.read(pcm_frames)
        out = np.zeros((frame.frames, self.channels), dtype=np.int32)
        for (i, c) in enumerate(self.__channels__):
            if c is not None:
                out[:, i] = frame.samples[:, c]
        return pcm.FrameList._wrap(out, frame.bits_per_sample)

    def close(self):
        self.pcmreader.close()


class PCMCat:
    """a PCMReader for concatenating several PCMReaders"""

    def __init__(self, pcmreaders):
        self.pcmreaders = list(pcmreaders)
        if len(self.pcmreaders) == 0:
            raise ValueError("at least one PCMReader is required")
        if len({r.sample_rate for r in self.pcmreaders}) != 1:
            raise ValueError("all readers must have the same sample rate")
        if len({r.channels for r in self.pcmreaders}) != 1:
            raise ValueError("all readers must have the same channel count")
        if len({r.bits_per_sample for r in self.pcmreaders}) != 1:
            raise ValueError("all readers must have the same bits per sample")

        self.__index__ = 0
        reader = self.pcmreaders[self.__index__]
        self.__read__ = reader.read
        self.sample_rate = reader.sample_rate
        self.channels = reader.channels
        self.channel_mask = reader.channel_mask
        self.bits_per_sample = reader.bits_per_sample

    def read(self, pcm_frames):
        framelist = self.__read__(pcm_frames)
        while len(framelist) == 0:
            self.__index__ += 1
            try:
                reader = self.pcmreaders[self.__index__]
            except IndexError:
                self.read = self.read_finished
                return self.read_finished(pcm_frames)
            self.__read__ = reader.read
            framelist = self.__read__(pcm_frames)
        return framelist

    def read_finished(self, pcm_frames):
        return pcm.empty_framelist(self.channels, self.bits_per_sample)

    def read_closed(self, pcm_frames):
        raise ValueError("stream is closed")

    def close(self):
        self.read = self.read_closed
        for reader in self.pcmreaders:
            reader.close()


class BufferedPCMReader:
    """a PCMReader which reads exact counts of PCM frames"""

    def __init__(self, pcmreader):
        self.pcmreader = pcmreader
        self.sample_rate = pcmreader.sample_rate
        self.channels = pcmreader.channels
        self.channel_mask = pcmreader.channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample
        self.buffer = pcm.empty_framelist(self.channels, self.bits_per_sample)

    def close(self):
        self.pcmreader.close()
        self.read = self.read_closed

    def read(self, pcm_frames):
        """reads exactly pcm_frames (fewer only at EOF), never more

        asks the wrapped reader for everything still missing in one
        call (readers may return less, so still loops): large batch
        reads come back as a single FrameList with no concatenation
        copies (the += fallback is O(n^2) over chunks)"""
        while self.buffer.frames < pcm_frames:
            frame = self.pcmreader.read(
                max(pcm_frames - self.buffer.frames, FRAMELIST_SIZE))
            if len(frame):
                if self.buffer.frames:
                    self.buffer += frame
                else:
                    self.buffer = frame
            else:
                break
        (output, self.buffer) = self.buffer.split(pcm_frames)
        return output

    def read_closed(self, pcm_frames):
        raise ValueError("stream is closed")


class CounterPCMReader:
    """a PCMReader which counts frames read through it"""

    def __init__(self, pcmreader):
        self.sample_rate = pcmreader.sample_rate
        self.channels = pcmreader.channels
        self.channel_mask = pcmreader.channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample
        self.__pcmreader__ = pcmreader
        self.frames_written = 0

    def bytes_written(self):
        return (self.frames_written *
                self.channels *
                (self.bits_per_sample // 8))

    def read(self, pcm_frames):
        frame = self.__pcmreader__.read(pcm_frames)
        self.frames_written += frame.frames
        return frame

    def close(self):
        self.__pcmreader__.close()


class LimitedFileReader:
    def __init__(self, file, total_bytes):
        self.__file__ = file
        self.__total_bytes__ = total_bytes
        try:
            self.__start__ = file.tell()
        except (IOError, OSError, AttributeError):
            self.__start__ = None
        self.__length__ = total_bytes

    def seek(self, byte_offset):
        """seeks to an absolute offset within the limited window

        returns the offset actually seeked to; only available when
        the underlying file is seekable"""
        if self.__start__ is None:
            raise IOError("stream is not seekable")
        byte_offset = max(min(byte_offset, self.__length__), 0)
        self.__file__.seek(self.__start__ + byte_offset, 0)
        self.__total_bytes__ = self.__length__ - byte_offset
        return byte_offset

    def read(self, x):
        if self.__total_bytes__ > 0:
            s = self.__file__.read(x)
            if len(s) <= self.__total_bytes__:
                self.__total_bytes__ -= len(s)
                return s
            else:
                s = s[0:self.__total_bytes__]
                self.__total_bytes__ = 0
                return s
        else:
            return b""

    def close(self):
        self.__file__.close()


class LimitedPCMReader:
    """limits a BufferedPCMReader to total_pcm_frames"""

    def __init__(self, buffered_pcmreader, total_pcm_frames):
        self.pcmreader = buffered_pcmreader
        self.total_pcm_frames = total_pcm_frames
        self.sample_rate = self.pcmreader.sample_rate
        self.channels = self.pcmreader.channels
        self.channel_mask = self.pcmreader.channel_mask
        self.bits_per_sample = self.pcmreader.bits_per_sample

    def read(self, pcm_frames):
        if self.total_pcm_frames > 0:
            frame = self.pcmreader.read(min(pcm_frames,
                                            self.total_pcm_frames))
            self.total_pcm_frames -= frame.frames
            return frame
        else:
            return pcm.empty_framelist(self.channels, self.bits_per_sample)

    def read_closed(self, pcm_frames):
        raise ValueError("stream is closed")

    def close(self):
        self.read = self.read_closed


class PCMReaderWindow:
    """a PCMReader wrapper with a frame offset and total frame count

    negative initial_offset pads the start with silence;
    pcm_frames pads or truncates the end (reference __init__.py:4842).
    pad_end=False streams until true EOF instead of zero-filling the
    window (PCMReaderDeHead semantics, reference __init__.py:4916 —
    its window is unbounded, so padding would never terminate)
    """

    def __init__(self, pcmreader, initial_offset, pcm_frames,
                 pad_end=True):
        self.pcmreader = pcmreader
        self.sample_rate = pcmreader.sample_rate
        self.channels = pcmreader.channels
        self.channel_mask = pcmreader.channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample
        self.initial_offset = initial_offset
        self.pcm_frames_remaining = pcm_frames
        self.pad_end = pad_end

    def read(self, pcm_frames):
        if self.pcm_frames_remaining <= 0:
            return pcm.empty_framelist(self.channels, self.bits_per_sample)

        if self.initial_offset == 0:
            frame = self.pcmreader.read(pcm_frames)
            if frame.frames <= self.pcm_frames_remaining:
                if frame.frames == 0:
                    if not self.pad_end:
                        self.pcm_frames_remaining = 0
                        return frame
                    # EOF before window exhausted: pad with silence
                    frame = pcm.FrameList._wrap(
                        np.zeros((min(pcm_frames,
                                      self.pcm_frames_remaining),
                                  self.channels), dtype=np.int32),
                        self.bits_per_sample)
                self.pcm_frames_remaining -= frame.frames
                return frame
            else:
                (frame, _) = frame.split(self.pcm_frames_remaining)
                self.pcm_frames_remaining = 0
                return frame
        elif self.initial_offset > 0:
            # skip frames forward
            while self.initial_offset > 0:
                frame = self.pcmreader.read(
                    min(self.initial_offset, FRAMELIST_SIZE))
                if frame.frames == 0:
                    # EOF while skipping: the source is exhausted, so
                    # the remaining window is padding (or nothing)
                    self.initial_offset = 0
                    break
                if frame.frames <= self.initial_offset:
                    self.initial_offset -= frame.frames
                else:
                    (_, frame) = frame.split(self.initial_offset)
                    self.initial_offset = 0
                    if frame.frames <= self.pcm_frames_remaining:
                        self.pcm_frames_remaining -= frame.frames
                        return frame
                    else:
                        (frame, _) = frame.split(self.pcm_frames_remaining)
                        self.pcm_frames_remaining = 0
                        return frame
            return self.read(pcm_frames)
        else:
            # pad the start with silence
            silence = min(-self.initial_offset, pcm_frames)
            self.initial_offset += silence
            frame = pcm.FrameList._wrap(
                np.zeros((min(silence, self.pcm_frames_remaining),
                          self.channels), dtype=np.int32),
                self.bits_per_sample)
            self.pcm_frames_remaining -= frame.frames
            return frame

    def close(self):
        self.pcmreader.close()


class PCMReaderHead(PCMReaderWindow):
    """truncates (or zero-extends) a stream's ENDING to exactly
    pcm_frames (reference __init__.py:4850)"""

    def __init__(self, pcmreader, pcm_frames):
        if pcm_frames < 0:
            raise ValueError("invalid pcm_frames value")
        PCMReaderWindow.__init__(self, pcmreader, 0, pcm_frames)


class PCMReaderDeHead(PCMReaderWindow):
    """removes pcm_frames from a stream's BEGINNING (negative values
    pad the start with silence; reference __init__.py:4916)"""

    def __init__(self, pcmreader, pcm_frames):
        PCMReaderWindow.__init__(self, pcmreader, pcm_frames,
                                 (1 << 62), pad_end=False)


def transfer_data(from_function, to_function):
    """sends BUFFER_SIZE chunks from from_function to to_function"""
    try:
        s = from_function(BUFFER_SIZE)
        while len(s) > 0:
            to_function(s)
            s = from_function(BUFFER_SIZE)
    except IOError:
        pass


def transfer_framelist_data(pcmreader, to_function,
                            signed=True, big_endian=False):
    """sends pcm.FrameLists from pcmreader to to_function as bytes"""
    f = pcmreader.read(FRAMELIST_SIZE)
    while len(f) > 0:
        to_function(f.to_bytes(big_endian, signed))
        f = pcmreader.read(FRAMELIST_SIZE)


def threaded_transfer_framelist_data(pcmreader, to_function,
                                     signed=True, big_endian=False):
    """like transfer_framelist_data but with a producer thread"""
    import threading
    import queue as queue_mod

    def send_data(pcmreader, q):
        try:
            s = pcmreader.read(FRAMELIST_SIZE)
            while len(s) > 0:
                q.put(s.to_bytes(big_endian, signed))
                s = pcmreader.read(FRAMELIST_SIZE)
            q.put(None)
        except (IOError, ValueError):
            q.put(None)

    data_queue = queue_mod.Queue(10)
    thread = threading.Thread(target=send_data,
                              args=(pcmreader, data_queue),
                              daemon=True)
    thread.start()
    s = data_queue.get()
    while s is not None:
        to_function(s)
        s = data_queue.get()


def pcm_cmp(pcmreader1, pcmreader2):
    """returns True if the PCM data in both readers is identical"""
    return pcm_frame_cmp(pcmreader1, pcmreader2) is None


def pcm_frame_cmp(pcmreader1, pcmreader2):
    """returns the PCM frame number of the first mismatch or None"""
    if ((pcmreader1.sample_rate != pcmreader2.sample_rate) or
            (pcmreader1.channels != pcmreader2.channels) or
            (pcmreader1.bits_per_sample != pcmreader2.bits_per_sample)):
        return 0

    if ((pcmreader1.channel_mask != 0) and
            (pcmreader2.channel_mask != 0) and
            (pcmreader1.channel_mask != pcmreader2.channel_mask)):
        return 0

    frame_number = 0
    reader1 = BufferedPCMReader(pcmreader1)
    reader2 = BufferedPCMReader(pcmreader2)

    framelist1 = reader1.read(FRAMELIST_SIZE)
    framelist2 = reader2.read(FRAMELIST_SIZE)

    while (len(framelist1) > 0) and (len(framelist2) > 0):
        if framelist1 != framelist2:
            n = min(framelist1.frames, framelist2.frames)
            a = framelist1.samples[:n]
            b = framelist2.samples[:n]
            mismatch = np.nonzero((a != b).any(axis=1))[0]
            if len(mismatch):
                return frame_number + int(mismatch[0])
            else:
                return frame_number + n - 1
        else:
            frame_number += framelist1.frames
            framelist1 = reader1.read(FRAMELIST_SIZE)
            framelist2 = reader2.read(FRAMELIST_SIZE)

    if (len(framelist1) > 0) or (len(framelist2) > 0):
        return frame_number
    else:
        return None


def pcm_split(reader, pcm_lengths):
    """yields a PCMReader for each pcm_length (in frames) from reader"""
    import io
    import tempfile

    def chunk_sizes(total_size, chunk_size):
        while total_size > chunk_size:
            total_size -= chunk_size
            yield chunk_size
        yield total_size

    full_data = BufferedPCMReader(reader)

    for pcm_length in pcm_lengths:
        if pcm_length > (FRAMELIST_SIZE * 10):
            sub_file = tempfile.TemporaryFile()
            for size in chunk_sizes(pcm_length, FRAMELIST_SIZE):
                sub_file.write(full_data.read(size).to_bytes(False, True))
            sub_file.seek(0, 0)
        else:
            sub_file = io.BytesIO(
                full_data.read(pcm_length).to_bytes(False, True))

        yield PCMReader(sub_file,
                        reader.sample_rate,
                        reader.channels,
                        reader.channel_mask,
                        reader.bits_per_sample)

    full_data.close()


def PCMConverter(pcmreader,
                 sample_rate,
                 channels,
                 channel_mask,
                 bits_per_sample):
    """a PCMReader wrapper chain converting rate/channels/mask/bps"""
    if sample_rate <= 0:
        raise ValueError("invalid sample rate")
    elif channels <= 0:
        raise ValueError("invalid channel count")
    elif bits_per_sample not in (8, 16, 24):
        raise ValueError("invalid bits per sample")

    if (channel_mask != 0) and (len(ChannelMask(channel_mask)) != channels):
        raise ValueError("channel count and mask mismatch")

    if pcmreader.channels > channels:
        if (channels == 1) and (channel_mask in (0, 0x4)):
            if pcmreader.channels > 2:
                from .pcmconverter import Averager, Downmixer
                pcmreader = Averager(Downmixer(pcmreader))
            else:
                from .pcmconverter import Averager
                pcmreader = Averager(pcmreader)
        elif (channels == 2) and (channel_mask in (0, 0x3)):
            from .pcmconverter import Downmixer
            pcmreader = Downmixer(pcmreader)
        else:
            pcmreader = RemaskedPCMReader(pcmreader, channels, channel_mask)
    elif pcmreader.channels < channels:
        pcmreader = ReorderedPCMReader(
            pcmreader,
            list(range(pcmreader.channels)) +
            [0] * (channels - pcmreader.channels),
            channel_mask)

    if pcmreader.sample_rate != sample_rate:
        from .pcmconverter import Resampler
        pcmreader = Resampler(pcmreader, sample_rate)

    if pcmreader.bits_per_sample != bits_per_sample:
        from .pcmconverter import BPSConverter
        pcmreader = BPSConverter(pcmreader, bits_per_sample)

    return pcmreader


def resampled_frame_count(initial_frame_count,
                          initial_sample_rate,
                          new_sample_rate):
    """returns the new PCM frame count after resampling"""
    if initial_sample_rate == new_sample_rate:
        return initial_frame_count
    else:
        from decimal import Decimal, ROUND_DOWN
        new_frame_count = ((Decimal(initial_frame_count) *
                            Decimal(new_sample_rate)) /
                           Decimal(initial_sample_rate))
        return int(new_frame_count.quantize(Decimal("1."),
                                            rounding=ROUND_DOWN))


def stripped_pcm_cmp(pcmreader1, pcmreader2):
    """returns True if the streams match after stripping leading and
    trailing null bytes (reference __init__.py:2413 — the comparison
    used when one tool pads streams with silence)"""
    if ((pcmreader1.sample_rate != pcmreader2.sample_rate) or
            (pcmreader1.channels != pcmreader2.channels) or
            (pcmreader1.bits_per_sample != pcmreader2.bits_per_sample)):
        return False

    import io as io_mod
    from hashlib import sha1

    digests = []
    for reader in (pcmreader1, pcmreader2):
        data = io_mod.BytesIO()
        transfer_framelist_data(reader, data.write)
        digests.append(sha1(data.getvalue().strip(b"\x00")).digest())
    return digests[0] == digests[1]
