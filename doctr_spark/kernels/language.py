"""Page-level language identification.

Reference ``get_language`` runs langdetect over the page's concatenated
text (`doctr/models/_utils.py:202-218`) and stores ``{value, confidence}``
on the Page. langdetect is not in this container, so this is a from-scratch
implementation of the classic Cavnar-Trenkle rank-order n-gram classifier
("N-Gram-Based Text Categorization", 1994 — the same family langdetect
descends from): each language has a profile of its most frequent character
1-3-grams ranked by frequency; a document is classified by the smallest
out-of-place distance between its own ranked profile and each language's.

Profiles are built at import time from small embedded seed paragraphs of
common running text per language — deterministic, no external data, no
model files. Confidence is the relative out-of-place advantage of the
winner (0 = indistinguishable from the profile-less baseline, 1 = perfect
rank agreement); a document whose best score stays under ``_MIN_SCORE``
(e.g. digits or consonant noise) is ``unknown``, like the reference's
LangDetectException fallback.
"""

from __future__ import annotations

import re
from collections import Counter

_PROFILE_SIZE = 300
_MIN_SCORE = 0.2
UNKNOWN = "unknown"

# Seed running text per language: ordinary sentences dense in the
# function words and orthography that distinguish each language.
_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the cat sleeps in "
        "the house with a friend for the day this is the story of what we "
        "have and what they said when the children were playing in the "
        "garden with their mother and the old man was reading a book about "
        "the history of the world that he found on the shelf"
    ),
    "es": (
        "el perro y el gato duermen en la casa de los vecinos con un amigo "
        "durante el dia esta es la historia de lo que tenemos y de lo que "
        "dijeron cuando los ninos jugaban en el jardin con su madre y el "
        "viejo hombre leia un libro sobre la historia del mundo que "
        "encontro en la estanteria de la biblioteca para aprender"
    ),
    "fr": (
        "le chien et le chat dorment dans la maison des voisins avec un ami "
        "pendant la journee voici l'histoire de ce que nous avons et de ce "
        "qu'ils ont dit quand les enfants jouaient dans le jardin avec leur "
        "mere et le vieil homme lisait un livre sur l'histoire du monde "
        "qu'il avait trouve sur l'etagere de la bibliotheque pour apprendre"
    ),
    "de": (
        "der hund und die katze schlafen im haus der nachbarn mit einem "
        "freund den ganzen tag das ist die geschichte von dem was wir haben "
        "und was sie sagten als die kinder im garten mit ihrer mutter "
        "spielten und der alte mann ein buch uber die geschichte der welt "
        "las das er im regal der bibliothek gefunden hatte um zu lernen"
    ),
    "it": (
        "il cane e il gatto dormono nella casa dei vicini con un amico "
        "durante il giorno questa e la storia di quello che abbiamo e di "
        "quello che hanno detto quando i bambini giocavano nel giardino con "
        "la loro madre e il vecchio uomo leggeva un libro sulla storia del "
        "mondo che aveva trovato sullo scaffale della biblioteca"
    ),
    "pt": (
        "o cachorro e o gato dormem na casa dos vizinhos com um amigo "
        "durante o dia esta e a historia do que temos e do que disseram "
        "quando as criancas brincavam no jardim com a sua mae e o velho "
        "homem lia um livro sobre a historia do mundo que encontrou na "
        "prateleira da biblioteca para aprender com as palavras"
    ),
    "el": (
        "ο σκυλος και η γατα κοιμουνται στο σπιτι των γειτονων με εναν "
        "φιλο ολη την ημερα αυτη ειναι η ιστορια για αυτα που εχουμε και "
        "για αυτα που ειπαν οταν τα παιδια επαιζαν στον κηπο με τη μητερα "
        "τους και ο γερος διαβαζε ενα βιβλιο για την ιστορια του κοσμου "
        "που βρηκε στο ραφι της βιβλιοθηκης για να μαθει"
    ),
    "ru": (
        "собака и кошка спят в доме соседей с другом весь день это "
        "история о том что у нас есть и о том что они сказали когда дети "
        "играли в саду со своей матерью и старик читал книгу об истории "
        "мира которую он нашел на полке библиотеки чтобы учиться"
    ),
    "nl": (
        "de hond en de kat slapen in het huis van de buren met een vriend "
        "de hele dag dit is het verhaal van wat wij hebben en wat zij "
        "zeiden toen de kinderen in de tuin speelden met hun moeder en de "
        "oude man een boek las over de geschiedenis van de wereld dat hij "
        "op de plank van de bibliotheek had gevonden om te leren"
    ),
    "pl": (
        "pies i kot śpią w domu sąsiadów z przyjacielem przez cały dzień "
        "to jest historia o tym co mamy i o tym co powiedzieli kiedy "
        "dzieci bawiły się w ogrodzie ze swoją matką a stary człowiek "
        "czytał książkę o historii świata którą znalazł na półce "
        "biblioteki żeby się uczyć nowych słów każdego dnia"
    ),
    "ar": (
        "الكلب والقطة ينامان في بيت الجيران مع صديق طوال اليوم هذه هي "
        "قصة ما لدينا وما قالوه عندما كان الأطفال يلعبون في الحديقة مع "
        "أمهم وكان الرجل العجوز يقرأ كتابا عن تاريخ العالم وجده على رف "
        "المكتبة من أجل أن يتعلم كلمات جديدة كل يوم"
    ),
    # CJK: no word separators, so the 1-gram ranks dominate (each han /
    # kana character is itself a strong signal); the clean regex admits
    # the script blocks and the padded-token grams still work because the
    # whole run becomes one token
    "zh": (
        "狗和猫整天睡在邻居的房子里和朋友在一起这是关于我们拥有什么的故事"
        "以及当孩子们和母亲在花园里玩耍时他们所说的话老人读了一本关于世界"
        "历史的书他在图书馆的书架上找到了它为了每天学习新的词语"
    ),
    "ja": (
        "犬と猫は一日中隣人の家で友達と眠っていますこれは私たちが持っている"
        "ものの物語であり子供たちが母親と庭で遊んでいたときに彼らが言った"
        "ことです老人は世界の歴史についての本を読みました彼はそれを図書館の"
        "棚で見つけました毎日新しい言葉を学ぶために"
    ),
    # Hangul is space-separated, so the affix grams work like latin
    "ko": (
        "개와 고양이는 하루 종일 이웃집에서 친구와 함께 잠을 잔다 이것은 "
        "우리가 가진 것에 대한 이야기이며 아이들이 어머니와 함께 정원에서 "
        "놀고 있을 때 그들이 말한 것이다 노인은 세계의 역사에 관한 책을 "
        "읽었다 그는 매일 새로운 단어를 배우기 위해 도서관 책장에서 그것을 "
        "찾았다"
    ),
    "tr": (
        "köpek ve kedi bütün gün komşunun evinde bir arkadaşla uyuyor bu "
        "bizim sahip olduklarımızın hikayesidir ve çocuklar anneleriyle "
        "bahçede oynarken söyledikleri şeylerdir yaşlı adam dünyanın tarihi "
        "hakkında bir kitap okudu onu her gün yeni kelimeler öğrenmek için "
        "kütüphanenin rafında buldu"
    ),
    "hi": (
        "कुत्ता और बिल्ली पूरे दिन पड़ोसी के घर में एक दोस्त के साथ सोते "
        "हैं यह उस की कहानी है जो हमारे पास है और जो उन्होंने कहा जब बच्चे "
        "अपनी मां के साथ बगीचे में खेल रहे थे बूढ़े आदमी ने दुनिया के "
        "इतिहास के बारे में एक किताब पढ़ी उसने उसे हर दिन नए शब्द सीखने के "
        "लिए पुस्तकालय की अलमारी पर पाया"
    ),
}

# letters of the supported scripts: latin (+ accents block), greek,
# cyrillic, arabic, devanagari, han, kana, hangul — everything else is
# a separator
_CLEAN_RE = re.compile(r"[^a-zÀ-ɏα-ωά-ώа-яё'؀-ۿऀ-ॿ぀-ヿ一-鿿가-힣]+")


def _ngrams(text: str) -> Counter:
    """Character 1-3-gram counts over space-padded words (Cavnar-Trenkle
    tokenization: padding marks word boundaries so grams capture affixes)."""
    counts: Counter = Counter()
    for tok in _CLEAN_RE.sub(" ", text.lower()).split():
        padded = f" {tok} "
        for n in (1, 2, 3):
            for i in range(len(padded) - n + 1):
                g = padded[i : i + n]
                if g != " ":
                    counts[g] += 1
    return counts


def _ranked_profile(text: str, size: int = _PROFILE_SIZE) -> dict[str, int]:
    # most_common ties broken by gram for determinism
    top = sorted(_ngrams(text).items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return {g: rank for rank, (g, _) in enumerate(top)}


_PROFILES: dict[str, dict[str, int]] = {lang: _ranked_profile(s) for lang, s in _SEEDS.items()}
LANGUAGES = tuple(sorted(_PROFILES))


def get_language(text: str) -> tuple[str, float]:
    """Return (language, confidence): smallest out-of-place distance over
    the embedded profiles; score = 1 - distance/max_distance, ``unknown``
    when even the best score is indistinguishable from noise."""
    doc = _ranked_profile(text)
    if not doc:
        return UNKNOWN, 0.0
    max_d = _PROFILE_SIZE * len(doc)
    best_lang, best_score = UNKNOWN, 0.0
    for lang in LANGUAGES:
        prof = _PROFILES[lang]
        d = sum(
            abs(rank - prof[g]) if g in prof else _PROFILE_SIZE for g, rank in doc.items()
        )
        score = 1.0 - d / max_d
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score < _MIN_SCORE:
        return UNKNOWN, 0.0
    return best_lang, round(best_score, 6)
