# Namespace root for the clean-room mini-protobuf runtime in
# google/protobuf/ (see that package's docstring). Present so
# `import google.protobuf` — which pyspark's transformWithStateInPandas
# state-server client requires — resolves in this container, where the
# real protobuf distribution is not installed.
