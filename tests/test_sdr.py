"""SDR host-producer tests: Beast serial configuration over a pty and
rtl-sdr plumbing that doesn't need hardware (gain snapping, buffer
shedding, graceful absence of librtlsdr)."""

import asyncio
import os

from readsb_tpu.io.sdr import RTL_GAINS, BeastSerialSource, RtlSdrSource


def test_beast_serial_options_over_pty():
    controller, follower = os.openpty()
    src = BeastSerialSource(
        path=os.ttyname(follower),
        mlat_timestamps=True, crc_checks=False,
        filter_df1117=True, mode_ac=True,
    )
    try:
        src.open()
        # a pty may deliver the 9 option triplets across several reads
        data = b""
        while len(data) < 27:
            data += os.read(controller, 4096)
    finally:
        src.close()
        os.close(controller)
        os.close(follower)
    # 0x1a '1' <opt> triplets, in the reference's beastInit order
    opts = [chr(data[i + 2]) for i in range(0, len(data), 3)]
    assert all(data[i] == 0x1A and data[i + 1] == ord("1") for i in range(0, len(data), 3))
    assert opts == ["B", "C", "H", "D", "E", "F", "g", "i", "J"]


def test_beast_serial_option_defaults():
    src = BeastSerialSource()
    assert src._options() == "BCHdEfgiJ".replace("J", "j")


def test_gns_hulc_over_pty():
    """GNS5894/HULC mode (--device-type gnshulc, SDR_GNS): no Beast option
    commands, just the firmware request (sdr_beast.c:162-164,231-247)."""
    controller, follower = os.openpty()
    src = BeastSerialSource(path=os.ttyname(follower), baud=921_600, gns=True)
    try:
        src.open()
        data = os.read(controller, 4096)
    finally:
        src.close()
        os.close(controller)
        os.close(follower)
    assert data == b"#00\r"


def test_device_type_aliases_parse():
    """All 8 reference hardware families are valid --device-type values
    (handler table sdr.c:94-122)."""
    from readsb_tpu.app.config import build_parser

    p = build_parser()
    for dt in ("ifile", "rtlsdr", "soapy", "modesbeast", "gnshulc",
               "hackrf", "bladerf", "ubladerf", "plutosdr", "none"):
        assert p.parse_args(["--device-type", dt]).device_type == dt


def test_rtl_gain_snap():
    # explicit gains snap to the nearest tuner step (tenths of dB)
    want = 43.5
    step = min(RTL_GAINS, key=lambda g: abs(g - want * 10))
    assert step == 434
    # unset gain => max step
    assert min(RTL_GAINS, key=lambda g: abs(g - 999 * 10)) == RTL_GAINS[-1]


def test_rtlsdr_queue_sheds_oldest():
    async def go():
        src = RtlSdrSource()
        for i in range(20):
            src._push(bytes([i]))
        assert src.dropped_buffers == 20 - src.queue.maxsize
        first = await src.queue.get()
        assert first == bytes([src.dropped_buffers])  # oldest were shed

    asyncio.run(go())


def test_rtlsdr_unavailable_is_clean():
    if RtlSdrSource.available():
        return  # host actually has librtlsdr; open() path exercised on hw
    try:
        RtlSdrSource().open()
    except RuntimeError as e:
        assert "librtlsdr" in str(e)
    else:
        raise AssertionError("open() must raise without librtlsdr")


def test_soapy_unavailable_is_clean():
    from readsb_tpu.io.sdr import SoapySource

    if SoapySource.available():
        return
    try:
        SoapySource().open()
    except RuntimeError as e:
        assert "SoapySDR" in str(e)
    else:
        raise AssertionError("open() must raise without libSoapySDR")


def test_soapy_queue_shares_rtl_shedding():
    import asyncio

    from readsb_tpu.io.sdr import SoapySource

    async def go():
        src = SoapySource()
        for i in range(20):
            src._push(bytes([i]))
        assert src.dropped_buffers == 20 - src.queue.maxsize

    asyncio.run(go())


def test_long_tail_backends_unavailable_is_clean():
    """hackrf/bladerf/pluto backends fail with a clear error when their
    native libraries are absent (VERDICT r3 #10: no silent misconfig)."""
    from readsb_tpu.io.sdr import BladeRfSource, HackRfSource, PlutoSource

    for cls, word in ((HackRfSource, "libhackrf"), (BladeRfSource, "libbladeRF"),
                      (PlutoSource, "libiio")):
        if cls.available():
            continue  # host actually has the library; open() path is live
        try:
            cls().open()
        except RuntimeError as e:
            assert word in str(e) and "ifile" in str(e)
        else:
            raise AssertionError(f"{cls.__name__}.open() must raise cleanly")


def test_long_tail_cli_options_parse():
    from readsb_tpu.app.config import parse_args

    a = parse_args([
        "--net-only", "--hackrf-enable-ampgain", "--hackrf-vgagain", "40",
        "--bladerf-fpga", "/tmp/x.rbf", "--bladerf-decimation", "2",
        "--bladerf-bandwidth", "bypass", "--pluto-uri", "usb:1.2.5",
        "--pluto-network", "pluto.local", "--soapy-gain-element", "LNA:20",
        "--dump-beast", "/tmp/d,45",
    ])
    assert a.hackrf_vgagain == 40 and a.bladerf_decimation == 2
    assert a.dump_beast_dir == "/tmp/d" and a.dump_beast_interval == 45.0
    for dt in ("hackrf", "bladerf", "plutosdr"):
        assert parse_args(["--device-type", dt]).device_type == dt
