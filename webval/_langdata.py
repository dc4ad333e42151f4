"""Tiny per-language function-word tables (public knowledge) shared by the
language tagger (extract.LangTagger) and the synthetic fixture generator
(synth.py).  The generator draws sentence tokens from these lists so the
tagger can recover the planted ``lang`` label — keeping the two in one module
guarantees they agree.
"""

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "on", "as", "are", "this", "but", "they", "have", "from", "not"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "von", "dem", "den", "sich", "auch", "werden", "aber", "nach", "wir"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "que", "qui", "sur", "pas", "avec", "par", "mais", "nous", "vous", "être", "avoir"],
    "es": ["el", "los", "las", "es", "una", "en", "por", "para", "con",
           "del", "se", "su", "lo", "como", "más", "pero", "sus", "fue", "ser", "hay"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die", "in",
           "is", "op", "aan", "met", "als", "voor", "er", "maar", "om", "hij"],
    "ru": ["и", "в", "не", "на", "я", "быть", "он", "с", "что", "а",
           "по", "это", "она", "этот", "к", "но", "они", "мы", "как", "из"],
    "zh": ["的", "一", "是", "了", "我", "不", "人", "在", "他", "有",
           "这", "个", "上", "们", "来", "到", "时", "大", "地", "为"],
}

# filler (non-stopword) vocabulary per language so documents are not 100%
# stopwords; latin fillers are shared, ru/zh get script-correct fillers.
FILLERS: dict[str, list[str]] = {
    "latin": ["data", "page", "info", "world", "report", "video", "music",
              "photo", "news", "market", "travel", "sport", "game", "house", "water"],
    "ru": ["данные", "страница", "мир", "отчет", "видео", "музыка", "фото",
           "новости", "рынок", "спорт"],
    "zh": ["数据", "页面", "世界", "报告", "视频", "音乐", "照片", "新闻", "市场", "体育"],
}


def fillers_for(lang: str) -> list[str]:
    if lang in ("ru", "zh"):
        return FILLERS[lang]
    return FILLERS["latin"]
