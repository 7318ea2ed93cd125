from .like import like_to_regex, like_to_java_regex, py_like  # noqa: F401
