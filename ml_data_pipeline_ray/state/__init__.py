from .dictionary import StringDictionary, DictionaryEncodeStage, build_global_dictionary  # noqa: F401
