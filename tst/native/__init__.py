from tst.native.fast_pack import native_available, pack_byte_batch  # noqa: F401
