"""Codec kernels: pure numpy/Arrow vectorized encoders and decoders.

Wire formats follow the Parquet encoding specs the reference implements
(see SURVEY.md §2.1 for the file:line map into /root/reference):

- ``bitpack``   : 8-value-group LSB-first bit packing (ref encoding/bitpacking*.go)
- ``hybrid``    : RLE / bit-packed hybrid int streams (ref encoding/hybrid-*.go)
- ``delta``     : DELTA_BINARY_PACKED int32/int64 (ref encoding/delta-binary-packed-*.go)
- ``dictionary``: dictionary page + hybrid index stream (ref types/dict.go, datastore/dict.go)
- ``bytearray`` : plain / delta-length / delta(prefix) byte arrays (ref types/byte-array.go)
- ``plain``     : plain fixed-width + boolean codecs (ref types/{int32,int64,float,double,boolean}.go)
- ``fsst``      : engine-new FSST string compression (FSST, VLDB 2020)
- ``for_bitpack``: engine-new frame-of-reference + bit-packing
- ``block``     : block compressors over encoded pages (ref compression/*.go)
"""
