"""Thai analyzer with a shipped default lexicon.

The reference ThaiAnalyzer (Analysis/Th/ThaiAnalyzer.cs, ThaiTokenizer.cs)
segments unspaced Thai text with the ICU dictionary BreakIterator and works
out of the box. No ICU data ships in this container, so the analog is the
repo's DictionarySegmenterCharFilter (greedy longest-match over Thai script
runs, functions/analysis_ext.py) loaded with the DEFAULT_THAI_WORDS lexicon
below.

Lexicon provenance: a small (~230 entry) list of high-frequency Thai
vocabulary — function words, pronouns, common verbs/nouns/adjectives,
numerals — written from general public knowledge of the language (the kind
of head-of-Zipf list any Thai frequency dictionary opens with). It is NOT
the ICU dictionary and makes no completeness claim: unknown spans pass
through as single tokens (the segmenter's documented behavior), and users
with a fuller word list can pass ``extra_words`` or replace the lexicon
entirely. The canonical segmentation vector from the reference's upstream
test suite — การที่ได้ต้องแสดงว่างานดี -> การ|ที่|ได้|ต้อง|แสดง|ว่า|งาน|ดี —
and the in-tree ThaiTokenizer.cs:46 probe ภาษาไทย -> ภาษา|ไทย both segment
correctly under it (tests/test_analysis_ext.py).
"""

from __future__ import annotations

# fmt: off
DEFAULT_THAI_WORDS: frozenset[str] = frozenset({
    # function words / particles
    "ที่", "และ", "แล้ว", "แต่", "หรือ", "ของ", "ใน", "บน", "ใต้", "กับ",
    "จาก", "ถึง", "ให้", "ได้", "ไม่", "เป็น", "คือ", "มี", "จะ", "ว่า",
    "ก็", "ด้วย", "อยู่", "นี้", "นั้น", "ซึ่ง", "เพราะ", "ถ้า", "เมื่อ",
    "ต้อง", "ควร", "อาจ", "กำลัง", "ยัง", "เคย", "กว่า", "ทุก", "บาง",
    "หลาย", "อีก", "เลย", "จริง", "นะ", "สิ", "ไหม", "ครับ", "ค่ะ",
    "การ", "ความ", "อย่าง", "เพื่อ", "โดย", "ตาม", "ระหว่าง", "ประมาณ",
    # question words
    "อะไร", "ทำไม", "อย่างไร", "ที่ไหน", "เมื่อไหร่", "เท่าไหร่", "กี่", "ใคร",
    # pronouns / people
    "ผม", "ฉัน", "ดิฉัน", "คุณ", "เขา", "เธอ", "เรา", "มัน", "ท่าน",
    "คน", "เด็ก", "ผู้ชาย", "ผู้หญิง", "เพื่อน", "ครู", "นักเรียน", "หมอ",
    "แม่", "พ่อ", "ลูก", "พี่", "น้อง", "ครอบครัว",
    # verbs
    "ไป", "มา", "กิน", "ดื่ม", "นอน", "นั่ง", "ยืน", "เดิน", "วิ่ง",
    "พูด", "บอก", "ถาม", "ตอบ", "อ่าน", "เขียน", "เรียน", "สอน", "ทำ",
    "ทำงาน", "เล่น", "ดู", "เห็น", "ฟัง", "รู้", "รู้จัก", "คิด",
    "เข้าใจ", "รัก", "ชอบ", "ต้องการ", "ซื้อ", "ขาย", "จ่าย", "ใช้",
    "ช่วย", "รอ", "หา", "พบ", "เจอ", "เปิด", "ปิด", "เริ่ม", "หยุด",
    "แสดง", "ขอ", "ขอบคุณ", "สวัสดี", "อยาก", "เอา", "ส่ง", "รับ",
    "เข้า", "ออก", "ขึ้น", "ลง", "กลับ", "อาศัย", "เกิด", "ตาย",
    # nouns
    "บ้าน", "โรงเรียน", "โรงพยาบาล", "ตลาด", "ร้าน", "เมือง", "ประเทศ",
    "ไทย", "กรุงเทพ", "ภาษา", "หนังสือ", "น้ำ", "ข้าว", "อาหาร",
    "ผลไม้", "รถ", "รถยนต์", "ถนน", "เงิน", "เวลา", "วัน", "คืน",
    "เช้า", "เย็น", "ปี", "เดือน", "สัปดาห์", "ชั่วโมง", "นาที", "งาน",
    "เรื่อง", "ชื่อ", "ใจ", "มือ", "ตา", "หู", "ปาก", "หัว", "ขา",
    "เท้า", "โลก", "ฟ้า", "ฝน", "แดด", "ลม", "ไฟ", "ต้นไม้", "ดอกไม้",
    "สัตว์", "หมา", "แมว", "นก", "ปลา", "ทะเล", "ภูเขา", "แม่น้ำ",
    # adjectives / adverbs
    "ดี", "เลว", "ใหญ่", "เล็ก", "ใหม่", "เก่า", "ร้อน", "หนาว",
    "สวย", "น่ารัก", "เร็ว", "ช้า", "แพง", "ถูก", "สูง", "ต่ำ",
    "ยาว", "สั้น", "อร่อย", "สนุก", "ง่าย", "ยาก", "สำคัญ", "มาก",
    "น้อย", "หมด", "เต็ม", "ว่าง", "ดัง", "เงียบ",
    # numerals
    "หนึ่ง", "สอง", "สาม", "สี่", "ห้า", "หก", "เจ็ด", "แปด", "เก้า",
    "สิบ", "ร้อย", "พัน", "หมื่น", "แสน", "ล้าน", "ศูนย์",
})
# fmt: on

# the Thai script block (U+0E01..U+0E5B); the segmenter only touches runs of
# these characters, so mixed Thai/Latin text segments only the Thai runs —
# the reference's per-script break-iterator behavior
THAI_ALPHABET = "".join(chr(c) for c in range(0x0E01, 0x0E5C))


def thai_analyzer(
    *,
    stop_words: frozenset[str] | None = None,
    extra_words=(),
):
    """A working out-of-the-box ThaiAnalyzer analog: dictionary segmentation
    (default lexicon + any ``extra_words``) as a char filter in front of the
    standard chain. Returns a ChainAnalyzer (kind='chain': indexes via the
    frequency path; Analyzer-compatible for search/parse)."""
    from .analysis import Analyzer
    from .analysis_ext import ChainAnalyzer, DictionarySegmenterCharFilter

    seg = DictionarySegmenterCharFilter(
        DEFAULT_THAI_WORDS | frozenset(extra_words), alphabet=THAI_ALPHABET
    )
    return ChainAnalyzer(
        base=Analyzer(stop_words=stop_words or frozenset()),
        char_filters=(seg,),
    )
