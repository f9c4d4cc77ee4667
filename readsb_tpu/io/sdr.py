"""Hardware sample sources: rtl-sdr USB dongles and Beast serial receivers.

The TPU pipeline consumes host byte buffers, so hardware capture is a
pure host producer: a reader thread fills fixed-size UC8 buffers and
hands them to the asyncio app, which feeds the Demodulator exactly like
ifile replay.  Behavior modeled on the reference backends:

- rtl-sdr: device open by index or serial, tuner gain / AGC, center
  frequency, ppm correction, bias tee, 16 x 256 KiB buffer ring
  (reference sdr_rtlsdr.c:86-266,419, readsb.h:112).  Bound with ctypes
  against librtlsdr; when the library is absent `RtlSdrSource.available()`
  is False and the CLI reports a clear error instead of crashing.
- Mode-S Beast serial: raw tty at 3 Mbaud (1 Mbaud fallback), receiver
  options sent as 0x1a '1' <opt> frames — binary format, mlat
  timestamps, CRC check, DF filters, Mode A/C — then the byte stream is
  Beast-deframed by the existing io.beast machinery
  (reference sdr_beast.c:34-40,130-232).
"""

from __future__ import annotations

import asyncio
import ctypes
import ctypes.util
import os
import threading
from dataclasses import dataclass, field

SDR_BUF_BYTES = 16 * 16384  # reference sdr_buf_size granule
SDR_N_BUFFERS = 16  # reference MODES_RTL_BUFFERS (readsb.h:112)

# rtl-sdr tuner gain steps in tenths of dB (reference help.h gain table)
RTL_GAINS = [
    0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197, 207, 229, 254,
    280, 297, 328, 338, 364, 372, 386, 402, 421, 434, 439, 445, 480,
    496, 580,
]


def _load_librtlsdr():
    name = ctypes.util.find_library("rtlsdr")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
        lib.rtlsdr_open  # sanity: the symbol surface we need
        return lib
    except OSError:
        return None


@dataclass
class RtlSdrSource:
    """Streams UC8 IQ buffers from an rtl-sdr dongle into an asyncio queue."""

    device: str = "0"  # index, or serial string (reference verbose_device_search)
    gain_db: float | None = None  # None => max gain; <= -10 => AGC
    freq_hz: int = 1_090_000_000
    ppm: int = 0
    biastee: bool = False
    sample_rate: int = 2_400_000
    buf_bytes: int = SDR_BUF_BYTES
    queue: asyncio.Queue = field(default_factory=lambda: asyncio.Queue(maxsize=SDR_N_BUFFERS))

    _lib = None
    _dev = None
    _stop: threading.Event = field(default_factory=threading.Event)
    dropped_buffers: int = 0

    @staticmethod
    def available() -> bool:
        return _load_librtlsdr() is not None

    def open(self) -> None:
        lib = _load_librtlsdr()
        if lib is None:
            raise RuntimeError(
                "librtlsdr not found — rtl-sdr capture unavailable on this host"
            )
        self._lib = lib
        idx = self._resolve_index(lib)
        dev = ctypes.c_void_p()
        if lib.rtlsdr_open(ctypes.byref(dev), idx) < 0:
            raise RuntimeError(f"rtlsdr_open({idx}) failed")
        self._dev = dev
        # gain: explicit value snaps to the nearest tuner step; -10 => AGC;
        # unset => maximum (reference rtlsdrSetGain, sdr_rtlsdr.c:86-131)
        if self.gain_db is not None and self.gain_db <= -10:
            lib.rtlsdr_set_tuner_gain_mode(dev, 0)
        else:
            lib.rtlsdr_set_tuner_gain_mode(dev, 1)
            want = int(round((self.gain_db if self.gain_db is not None else 999) * 10))
            step = min(RTL_GAINS, key=lambda g: abs(g - want))
            lib.rtlsdr_set_tuner_gain(dev, step)
        if self.ppm:
            lib.rtlsdr_set_freq_correction(dev, int(self.ppm))
        lib.rtlsdr_set_center_freq(dev, int(self.freq_hz))
        lib.rtlsdr_set_sample_rate(dev, int(self.sample_rate))
        try:
            lib.rtlsdr_set_bias_tee(dev, 1 if self.biastee else 0)
        except AttributeError:
            pass  # older librtlsdr without bias-tee support
        lib.rtlsdr_reset_buffer(dev)

    def _resolve_index(self, lib) -> int:
        # bare integer = device index; otherwise match by serial
        try:
            return int(self.device)
        except ValueError:
            pass
        lib.rtlsdr_get_index_by_serial.argtypes = [ctypes.c_char_p]
        idx = lib.rtlsdr_get_index_by_serial(self.device.encode())
        if idx < 0:
            raise RuntimeError(f"no rtl-sdr device with serial {self.device!r}")
        return idx

    def start(self, loop: asyncio.AbstractEventLoop) -> threading.Thread:
        """Reader thread: blocking rtlsdr_read_sync into the asyncio queue.

        A full queue drops the oldest buffer (the demod is behind realtime;
        shedding whole buffers keeps sample alignment per buffer boundary).
        """
        lib, dev = self._lib, self._dev

        def reader():
            buf = ctypes.create_string_buffer(self.buf_bytes)
            n_read = ctypes.c_int(0)
            while not self._stop.is_set():
                r = lib.rtlsdr_read_sync(dev, buf, self.buf_bytes, ctypes.byref(n_read))
                if r < 0:
                    break  # USB gone — app-level watchdog restarts or exits
                data = buf.raw[: n_read.value]
                loop.call_soon_threadsafe(self._push, data)
            loop.call_soon_threadsafe(self.queue.put_nowait, b"")  # EOF marker

        t = threading.Thread(target=reader, name="rtlsdr-reader", daemon=True)
        t.start()
        self._thread = t
        return t

    def _push(self, data: bytes) -> None:
        if self.queue.full():
            try:
                self.queue.get_nowait()
                self.dropped_buffers += 1
            except asyncio.QueueEmpty:
                pass
        self.queue.put_nowait(data)

    def close(self) -> None:
        # rtlsdr_cancel_async does NOT interrupt a synchronous read, so the
        # reader thread may still be inside rtlsdr_read_sync on this handle;
        # closing under it is a use-after-free.  Signal stop, wait for the
        # in-flight read to return (one buffer period, ~55 ms), then close.
        self._stop.set()
        t = getattr(self, "_thread", None)
        if t is not None and t.is_alive():
            t.join(timeout=2.0)
        if self._lib is not None and self._dev is not None:
            try:
                self._lib.rtlsdr_cancel_async(self._dev)
            except AttributeError:
                pass
            self._lib.rtlsdr_close(self._dev)
            self._dev = None


def _load_libsoapy():
    name = ctypes.util.find_library("SoapySDR")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
        lib.SoapySDRDevice_makeStrArgs
        return lib
    except OSError:
        return None


@dataclass
class SoapySource:
    """SoapySDR capture (sdr_soapy.c behavior): device by args string,
    CS16 stream at 2.4 MS/s resampled to the UC8 pipeline via the SC16
    input format.  Gated on libSoapySDR presence like RtlSdrSource."""

    device_args: str = ""
    gain_db: float | None = None  # None/<=-10 => hardware AGC
    freq_hz: int = 1_090_000_000
    sample_rate: int = 2_400_000
    antenna: str | None = None
    bandwidth: float | None = None
    queue: asyncio.Queue = field(default_factory=lambda: asyncio.Queue(maxsize=SDR_N_BUFFERS))
    _lib = None
    _dev = None
    _stream = None
    _stop: threading.Event = field(default_factory=threading.Event)
    dropped_buffers: int = 0

    SOAPY_SDR_RX = 1  # SoapySDR/Constants.h

    @staticmethod
    def available() -> bool:
        return _load_libsoapy() is not None

    def open(self) -> None:
        lib = _load_libsoapy()
        if lib is None:
            raise RuntimeError(
                "libSoapySDR not found — soapy capture unavailable on this host"
            )
        self._lib = lib
        lib.SoapySDRDevice_makeStrArgs.restype = ctypes.c_void_p
        dev = lib.SoapySDRDevice_makeStrArgs(self.device_args.encode())
        if not dev:
            raise RuntimeError(f"soapy: no device for args {self.device_args!r}")
        self._dev = ctypes.c_void_p(dev)
        ch = 0
        lib.SoapySDRDevice_setSampleRate(
            self._dev, self.SOAPY_SDR_RX, ch, ctypes.c_double(self.sample_rate)
        )
        lib.SoapySDRDevice_setFrequency(
            self._dev, self.SOAPY_SDR_RX, ch, ctypes.c_double(self.freq_hz), None
        )
        if self.antenna:
            lib.SoapySDRDevice_setAntenna(
                self._dev, self.SOAPY_SDR_RX, ch, self.antenna.encode()
            )
        if self.bandwidth:
            lib.SoapySDRDevice_setBandwidth(
                self._dev, self.SOAPY_SDR_RX, ch, ctypes.c_double(self.bandwidth)
            )
        if self.gain_db is None or self.gain_db <= -10:
            lib.SoapySDRDevice_setGainMode(self._dev, self.SOAPY_SDR_RX, ch, 1)
        else:
            lib.SoapySDRDevice_setGainMode(self._dev, self.SOAPY_SDR_RX, ch, 0)
            lib.SoapySDRDevice_setGain(
                self._dev, self.SOAPY_SDR_RX, ch, ctypes.c_double(self.gain_db)
            )
        lib.SoapySDRDevice_setupStream.restype = ctypes.c_void_p
        chans = (ctypes.c_size_t * 1)(ch)
        self._stream = ctypes.c_void_p(
            lib.SoapySDRDevice_setupStream(
                self._dev, self.SOAPY_SDR_RX, b"CS16", chans, 1, None
            )
        )
        if not self._stream:
            raise RuntimeError("soapy: setupStream(CS16) failed")
        lib.SoapySDRDevice_activateStream(self._dev, self._stream, 0, 0, 0)

    def start(self, loop: asyncio.AbstractEventLoop) -> threading.Thread:
        lib, dev, stream = self._lib, self._dev, self._stream
        n_samples = SDR_BUF_BYTES // 4  # CS16 = 4 bytes/sample

        def reader():
            buf = (ctypes.c_int16 * (2 * n_samples))()
            bufs = (ctypes.c_void_p * 1)(ctypes.addressof(buf))
            flags = ctypes.c_int(0)
            time_ns = ctypes.c_longlong(0)
            while not self._stop.is_set():
                n = lib.SoapySDRDevice_readStream(
                    dev, stream, bufs, n_samples,
                    ctypes.byref(flags), ctypes.byref(time_ns), 1_000_000,
                )
                if n <= 0:
                    if n == -1:  # SOAPY_SDR_TIMEOUT
                        continue
                    break
                data = ctypes.string_at(buf, n * 4)
                loop.call_soon_threadsafe(self._push, data)
            loop.call_soon_threadsafe(self.queue.put_nowait, b"")

        t = threading.Thread(target=reader, name="soapy-reader", daemon=True)
        t.start()
        return t

    _push = RtlSdrSource._push

    def close(self) -> None:
        self._stop.set()
        if self._lib is not None and self._dev is not None:
            if self._stream is not None:
                self._lib.SoapySDRDevice_deactivateStream(self._dev, self._stream, 0, 0)
                self._lib.SoapySDRDevice_closeStream(self._dev, self._stream)
                self._stream = None
            self._lib.SoapySDRDevice_unmake(self._dev)
            self._dev = None


@dataclass
class BeastSerialSource:
    """Raw-tty Beast receiver: configures the port + receiver options and
    exposes the file descriptor for the app's Beast deframer."""

    path: str = "/dev/ttyUSB0"
    baud: int = 3_000_000
    mlat_timestamps: bool = True
    crc_checks: bool = True
    fec: bool = True
    filter_df1117: bool = False
    filter_df045: bool = False
    mode_ac: bool = False
    fd: int = -1

    def open(self) -> int:
        import termios

        self.fd = os.open(self.path, os.O_RDWR | os.O_NOCTTY | os.O_NONBLOCK)
        tios = termios.tcgetattr(self.fd)
        # raw 8N1, no flow control (reference sdr_beast.c:160-190)
        tios[0] = termios.IGNPAR  # iflag
        tios[1] = 0  # oflag
        tios[2] = termios.CS8 | termios.CREAD | termios.CLOCAL  # cflag
        tios[3] = 0  # lflag
        for b in (self.baud, 1_000_000, 115_200):
            code = getattr(termios, f"B{b}", None)
            if code is None:
                continue
            tios[4] = tios[5] = code
            try:
                termios.tcsetattr(self.fd, termios.TCSANOW, tios)
                self.baud = b
                break
            except termios.error:
                continue
        termios.tcflush(self.fd, termios.TCIOFLUSH)
        for opt in self._options():
            os.write(self.fd, bytes([0x1A, ord("1"), ord(opt)]))
        return self.fd

    def _options(self) -> str:
        # case selects enable/disable, mirroring beastInit (sdr_beast.c:192-232)
        opts = ["B", "C", "H"]  # classic beast, binary format, RTS
        opts.append("D" if self.filter_df1117 else "d")
        opts.append("E" if self.mlat_timestamps else "e")
        opts.append("f" if self.crc_checks else "F")
        opts.append("G" if self.filter_df045 else "g")
        opts.append("i" if self.fec else "I")
        opts.append("J" if self.mode_ac else "j")
        return "".join(opts)

    def close(self) -> None:
        if self.fd >= 0:
            os.close(self.fd)
            self.fd = -1
