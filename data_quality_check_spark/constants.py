"""Single source of truth for every rule threshold, lexicon and pattern.

Both the distributed Spark pipeline (Column expressions + pandas UDFs)
and the pure-pandas reference oracle (``tests/oracle.py``) import the
constants below, which is what makes keep/drop F1 == 1.0 reachable by
construction (SURVEY.md §0.1, §7 M0).

Reference capability being realized: row-level data-quality rule
evaluation over big data (/root/reference/README.md:2); concrete rule
set mandated by BASELINE.json:6,14,15.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Rule names (canonical order == drop_reasons order)
# ---------------------------------------------------------------------------

RULE_NULL = "null_fields"
RULE_TOO_SHORT = "too_short"
RULE_TOO_LONG = "too_long"
RULE_REPETITION = "repetition"
RULE_STOPWORD = "low_stopword_ratio"
RULE_SYMBOL = "high_symbol_density"
RULE_LANG = "lang_unknown"
RULE_PPL = "high_perplexity"
RULE_TOXIC = "toxic"
RULE_PIXEL = "pixel_invalid"
RULE_DUP = "duplicate"

RULE_ORDER = [
    RULE_NULL,
    RULE_TOO_SHORT,
    RULE_TOO_LONG,
    RULE_REPETITION,
    RULE_STOPWORD,
    RULE_SYMBOL,
    RULE_LANG,
    RULE_PPL,
    RULE_TOXIC,
    RULE_PIXEL,
    RULE_DUP,
]

# ---------------------------------------------------------------------------
# Heuristic rule thresholds (BASELINE.json:6 "length, repetition,
# stopword ratio, symbol density")
# ---------------------------------------------------------------------------

MIN_CAPTION_LEN = 12          # chars, inclusive lower bound for keep
MAX_CAPTION_LEN = 600         # chars, inclusive upper bound for keep
MIN_DISTINCT_TOKEN_RATIO = 0.5  # distinct/total tokens; below => repetition
MIN_STOPWORD_RATIO = 0.05     # stopword tokens / tokens; below => drop
STOPWORD_MIN_TOKENS = 5       # rule only applies when >= this many tokens
MAX_SYMBOL_DENSITY = 0.30     # symbol chars / chars; above => drop

# Symbol = anything that is not an ASCII alnum, ASCII whitespace,
# Latin-1/ext letter, or CJK ideograph.  Whitespace is the EXPLICIT
# ASCII set, never `\s`: Python `re` reads \s as Unicode whitespace
# (U+00A0, U+3000, ...), Java regex as ASCII-only, and RE2 (DuckDB)
# as ASCII-without-\x0b — three different symbol counts on the same
# caption.  With the explicit set all engines agree (and U+00A0 /
# U+3000 deliberately count as symbols).  The Spark rule uses the
# positive (allowed) class because Java evaluates negated unicode
# classes ~10x slower.
ASCII_WS = r" \t\n\r\f\x0b"
SYMBOL_CHAR_CLASS = rf"[^0-9A-Za-z{ASCII_WS}À-ɏ぀-ヿ一-鿿]"
ALLOWED_CHAR_CLASS = rf"[0-9A-Za-z{ASCII_WS}À-ɏ぀-ヿ一-鿿]"

# ---------------------------------------------------------------------------
# Language ID (BASELINE.json:6 "fastText language identification")
# ---------------------------------------------------------------------------

LANGS = ["de", "en", "es", "fr", "zh"]  # sorted; model class order
LANG_UND = "und"
MIN_LANG_CONF = 0.60          # softmax confidence below => und
MIN_ALPHA_CHARS = 4           # fewer informative chars => und
LANGID_SOFTMAX_TEMP = 8.0     # scale on mean log-prob before softmax

# ---------------------------------------------------------------------------
# Perplexity (BASELINE.json:6 "KenLM-style n-gram perplexity")
# ---------------------------------------------------------------------------

PPL_ORDER = 3                 # char trigram LM
PPL_BACKOFF = 0.4             # stupid backoff factor
MAX_PPL = 80.0                # keep iff ppl <= MAX_PPL; calibrated: real-lang
                              # captions score <= ~25, gibberish >= ~190

# ---------------------------------------------------------------------------
# Pixel-level image quality rules (LAION/DataComp-style visual
# filters over the decoded image; kernels/imgstats.py).  Thresholds
# calibrated on the synthetic corpus so each rule flags a small
# realistic tail (1-10% at sf0.01); geometry rules need no decode.
# ---------------------------------------------------------------------------

IMG_MIN_PIXELS = 256          # w*h below => res_ok false (16x16 floor)
IMG_MAX_ASPECT = 3            # max(w,h) > 3*min(w,h) => aspect_ok false
IMG_ENTROPY_MIN = 3.0         # gray-histogram Shannon bits; below => flat
IMG_CONTRAST_MIN = 8.0        # RMS contrast (gray std); below => washed out
IMG_BLUR_VAR_MIN = 40.0       # variance-of-Laplacian; below => blurry
IMG_FLAT_MAX = 0.5            # dominant gray bin share; above => flat
IMG_DARK_MAX = 0.7            # gray<16 share; above => underexposed
IMG_BRIGHT_MAX = 0.7          # gray>=240 share; above => overexposed
IMG_COLORFULNESS_MIN = 15.0   # Hasler-Suesstrunk metric; below =>
                              # grayscale / washed-out (~0.6% tail)

# Visual-risk stand-ins (kernels/imgrisk.py): watermark-overlay region
# statistics, Kovac skin rule, hand-crafted aesthetic blend.
# Calibrated on the synthetic corpus (sf0.001 percentiles: wm_strip
# p90=0.11/p95=0.36, wm_corner p95=0.57, skin p90=0.22/p95=0.39,
# aesthetic p05=0.40) so each flags a 4-8% tail.
IMG_WM_STRIP_MAX = 0.30       # bottom-strip overlay share above => watermark
IMG_WM_CORNER_MAX = 0.50      # corner overlay share above => watermark
IMG_SKIN_MAX = 0.30           # skin-pixel share above => NSFW stand-in flag
IMG_AESTHETIC_MIN = 0.40      # aesthetic blend below => low-quality visual

# ---------------------------------------------------------------------------
# Dedup / partitioning (BASELINE.json:14 "salted repartition on phash
# buckets to defuse skew from duplicate-heavy shards")
# ---------------------------------------------------------------------------

N_BUCKETS = 64                # pmod(phash, N_BUCKETS)
SALT_FACTOR = 8               # salts per hot bucket
HOT_BUCKET_ALPHA = 2.0        # bucket is hot if count > alpha * mean

# ---------------------------------------------------------------------------
# PII / toxicity scrub (BASELINE.json:6 "regex-based PII/email/phone/
# toxicity scrubbing ... compiled-pattern pandas UDF").
# Order matters: applied top to bottom; both oracle and UDF iterate
# this list.  Patterns are Python-`re` syntax (the scrub runs only in
# Python workers / the oracle, never in JVM regex).
# ---------------------------------------------------------------------------

SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("url", r"\bhttps?://[^\s]+", "<URL>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("credit_card", r"\b(?:\d{4}[ -]){3}\d{4}\b", "<CC>"),
    ("phone", r"(?<![\w.])\+?\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{2,4}(?![\w-])", "<PHONE>"),
]

# words whose presence marks the caption toxic; they are also replaced.
TOXIC_WORDS = ["frakk", "gorram", "smeghead", "drokk", "felgercarb"]
TOXIC_REPLACEMENT = "<TOX>"

# ---------------------------------------------------------------------------
# Stopword lexicon: high-frequency function words per supported
# language.  Used by the stopword-ratio rule (broadcast set) and by the
# synthetic caption generator, so natural captions pass the rule.
# ---------------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is", "on", "with", "for"],
    "fr": ["le", "la", "de", "et", "un", "une", "dans", "sur", "avec", "est"],
    "es": ["el", "la", "de", "y", "un", "una", "en", "con", "por", "es"],
    "de": ["der", "die", "das", "und", "ein", "eine", "in", "mit", "auf", "ist"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "他", "这", "不"],
}
STOPWORD_SET = sorted({w for ws in STOPWORDS.values() for w in ws})

# ---------------------------------------------------------------------------
# Word pools for the synthetic caption generator AND the langid /
# perplexity training corpus (SURVEY.md §2 O-3, O-10, O-11).  The
# models are trained on these pools at import time (deterministic, no
# network / no fasttext binary in the sandbox).
# ---------------------------------------------------------------------------

WORD_POOLS = {
    "en": STOPWORDS["en"] + [
        "photo", "image", "picture", "sunset", "mountain", "river", "city",
        "street", "night", "light", "people", "woman", "man", "child",
        "dog", "cat", "bird", "tree", "flower", "beach", "ocean", "sky",
        "cloud", "house", "building", "bridge", "car", "train", "market",
        "food", "coffee", "winter", "summer", "autumn", "spring", "snow",
        "rain", "forest", "garden", "portrait", "landscape", "closeup",
        "vintage", "modern", "colorful", "beautiful", "small", "large",
        "old", "young", "red", "blue", "green", "white", "black",
    ],
    "fr": STOPWORDS["fr"] + [
        "photo", "image", "coucher", "soleil", "montagne", "rivière",
        "ville", "rue", "nuit", "lumière", "gens", "femme", "homme",
        "enfant", "chien", "chat", "oiseau", "arbre", "fleur", "plage",
        "océan", "ciel", "nuage", "maison", "bâtiment", "pont", "voiture",
        "marché", "nourriture", "café", "hiver", "été", "automne",
        "printemps", "neige", "pluie", "forêt", "jardin", "paysage",
        "ancien", "moderne", "coloré", "beau", "petit", "grand", "vieux",
        "jeune", "rouge", "bleu", "vert", "blanc", "noir",
    ],
    "es": STOPWORDS["es"] + [
        "foto", "imagen", "atardecer", "montaña", "río", "ciudad", "calle",
        "noche", "luz", "gente", "mujer", "hombre", "niño", "perro",
        "gato", "pájaro", "árbol", "flor", "playa", "océano", "cielo",
        "nube", "casa", "edificio", "puente", "coche", "mercado",
        "comida", "café", "invierno", "verano", "otoño", "primavera",
        "nieve", "lluvia", "bosque", "jardín", "paisaje", "antiguo",
        "moderno", "colorido", "hermoso", "pequeño", "grande", "viejo",
        "joven", "rojo", "azul", "verde", "blanco", "negro",
    ],
    "de": STOPWORDS["de"] + [
        "foto", "bild", "sonnenuntergang", "berg", "fluss", "stadt",
        "straße", "nacht", "licht", "leute", "frau", "mann", "kind",
        "hund", "katze", "vogel", "baum", "blume", "strand", "ozean",
        "himmel", "wolke", "haus", "gebäude", "brücke", "auto", "markt",
        "essen", "kaffee", "winter", "sommer", "herbst", "frühling",
        "schnee", "regen", "wald", "garten", "landschaft", "alt",
        "modern", "bunt", "schön", "klein", "groß", "jung", "rot",
        "blau", "grün", "weiß", "schwarz",
    ],
    "zh": STOPWORDS["zh"] + [
        "照片", "图片", "日落", "山", "河", "城市", "街道", "夜晚", "灯光",
        "人们", "女人", "男人", "孩子", "狗", "猫", "鸟", "树", "花",
        "海滩", "海洋", "天空", "云", "房子", "建筑", "桥", "汽车",
        "市场", "食物", "咖啡", "冬天", "夏天", "秋天", "春天", "雪",
        "雨", "森林", "花园", "风景", "古老", "现代", "多彩", "美丽",
        "小", "大", "老", "年轻", "红色", "蓝色", "绿色", "白色", "黑色",
    ],
}

# ---------------------------------------------------------------------------
# Pixel invariant (BASELINE.json:15)
# ---------------------------------------------------------------------------

MIN_PSNR_DB = 40.0            # lossy formats on real clusters; sandbox
                              # formats (raw/ppm/png) are lossless => inf

# Synthetic generator knobs (FIXTURES.md §A1)
GEN_SEED = 42
SF_ROWS = 1_000_000           # rows at SF=1.0

# ---------------------------------------------------------------------------
# Audio quality rules (round-4: the audio modality's visual-rules twin;
# PCM-WAV is decodable from scratch — RIFF parse + int16 — so unlike
# the ffmpeg-class formats this path is REAL in-sandbox, not stubbed)
# ---------------------------------------------------------------------------

AUDIO_SF_ROWS = 200_000       # clips at SF=1.0 (1/5th of images)
AUDIO_SR = 8_000              # generator sample rate (Hz)
AUDIO_MIN_DURATION_S = 0.2    # shorter clips carry no usable signal
AUDIO_SILENCE_RMS_DB = -60.0  # full-clip loudness floor (dBFS)
AUDIO_CLIP_FRAC_MAX = 0.01    # saturated-sample share ceiling
AUDIO_SILENCE_FRAC_MAX = 0.9  # near-zero-sample share ceiling
AUDIO_DC_FRAC_MAX = 0.05      # |mean|/full-scale ceiling (DC offset)

# Video stand-in container (round-4; ffmpeg is unavailable, so the
# container is a documented from-scratch format — real PLUMBING,
# fake-but-deterministic payload, per the driver's multimodal rule)
VIDEO_SF_ROWS = 20_000        # videos at SF=1.0
VIDEO_W, VIDEO_H = 32, 32     # gray frames
VIDEO_FPS = 8
VIDEO_SAMPLE_FRAMES = 8       # stride-sampled frames per video
VIDEO_MIN_DURATION_S = 0.5
VIDEO_MOTION_MIN = 0.002      # mean inter-frame |diff|/255 floor
VIDEO_BLACK_FRAC_MAX = 0.5    # share of near-black sampled frames
VIDEO_MIN_FRAMES = 4
