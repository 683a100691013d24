# internal helpers of the mini-protobuf runtime (builder.py)
