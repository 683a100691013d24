# Namespace root for the clean-room mini-protobuf runtime in
# google/protobuf/ (see that package's docstring). Present so
# `import google.protobuf` — which pyspark's transformWithStateInPandas
# state-server client requires — resolves in this container, where the
# real protobuf distribution is not installed.
#
# extend_path keeps this from shadowing a real google.* distribution
# (protobuf, grpc, google-auth) if one is ever installed: the repo root
# sorts first on sys.path, so without it this regular package would
# truncate the namespace and hide every other google.* subpackage.
from pkgutil import extend_path

__path__ = extend_path(__path__, __name__)
