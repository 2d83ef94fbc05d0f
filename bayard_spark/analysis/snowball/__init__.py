"""Pure-Python Snowball stemmer registry (17 languages + English Porter2).

Mirrors the full language set the reference's stemming filter accepts
(bayard/src/index/token_filter/stemming.rs:249-265; docs/analyzers.md:229).
Each is a hand port of the public Snowball algorithm description, validated
against PostgreSQL's stopword-free snowball dictionaries (tests/data/
snowball/ golden pairs): 17/18 at 100% on their probe suites (structured
grids + random-script probes). Tamil (round 4) is at 100% on the probe
suite and the real-stem x real-suffix grid, ~99.3% on fully random legal-
script sequences — the residual is pathological consonant-cluster chains
whose path-dependent fix_endings behavior a suffix pipeline cannot
express; see snowball/tamil.py for the enumerated cases.
"""

from __future__ import annotations

from bayard_spark.analysis.snowball.scandinavian import (
    _DA_STEP1,
    _NO_STEP1_DEL,
    _SV_STEP1,
    danish,
    norwegian,
    swedish,
)
from bayard_spark.analysis.snowball.germanic import dutch, german
from bayard_spark.analysis.snowball.finnish import finnish
from bayard_spark.analysis.snowball.tamil import tamil
from bayard_spark.analysis.snowball.french import _STEP1, _STEP2A, french
from bayard_spark.analysis.snowball.spanish import (
    _S1_DELETE_R2,
    _STEP2B,
    spanish,
)
from bayard_spark.analysis.snowball.hungarian import (
    _CASE as _HU_CASE,
    hungarian,
)
from bayard_spark.analysis.snowball.italian import (
    _S1_DELETE_R2 as _IT_S1,
    _STEP2 as _IT_STEP2,
    italian,
)
from bayard_spark.analysis.snowball.romanian import (
    _STEP2_DELETE as _RO_STEP2,
    _STEP3_A as _RO_STEP3,
    romanian,
)
from bayard_spark.analysis.snowball.portuguese import (
    _S1_ADOR as _PT_ADOR,
    _STEP2 as _PT_STEP2,
    portuguese,
)
from bayard_spark.analysis.snowball.turkish import turkish
from bayard_spark.analysis.snowball.arabic import arabic
from bayard_spark.analysis.snowball.greek import greek
from bayard_spark.analysis.snowball.russian import (
    _ADJECTIVE,
    _NOUN,
    _VERB_1,
    _VERB_2,
    russian,
)
from bayard_spark.analysis.stemmer import porter2_stem

danish.probe_suffixes = _DA_STEP1 + ["s", "igst", "løst"]
norwegian.probe_suffixes = _NO_STEP1_DEL + ["s", "ert", "erte", "hetslov"]
swedish.probe_suffixes = _SV_STEP1 + ["s", "fullt", "löst"]
german.probe_suffixes = (
    "em ern er e en es s est st end ung ig ik isch lich heit keit "
    "igkeit lichkeit igend ungen iger isches ernd heiten"
).split()
dutch.probe_suffixes = (
    "heden ene en se s e heid end ing ig lijk baar bar ingen igheid "
    "elijk enden baarheid"
).split()
russian.probe_suffixes = (
    _ADJECTIVE + _VERB_1 + _VERB_2 + _NOUN
    + "вшись ившись ався явшись ся сь ость ост нн ейше ейш ь аете ание "
      "аннее авшими ующими ывшийся".split()
)

french.probe_suffixes = (
    _STEP1 + _STEP2A
    + ("ions ique iques é ée ées és èrent er era erai erais ez iez a as "
       "ante antes ants ai ais ait ant ion ier ière e s eaux aux euse "
       "amment emment ment ments ation ique ativement iquement eusement "
       "issements atrice logie usion ence ité ivité icité abilité atif "
       "ateur ic iqu").split()
)

spanish.probe_suffixes = (
    _S1_DELETE_R2 + _STEP2B
    + ("ución logía encia amente mente idad iva ivo ación ador ante "
       "ancia me se sela selo la le lo nos ándosela iéndoselo árme "
       "ya ye yan yendo yó os a o á í ó e é en es éis emos ualidad "
       "atividad icamente osamente adoras aciones").split()
)

portuguese.probe_suffixes = (
    _PT_ADOR + _PT_STEP2
    + ("eza ismo ável ível ista oso amento imento logia uça~o ução ência "
       "amente mente idade iva ivo ira eiras ações ção ções os a i o á í "
       "ó e é ê ç gue cie icamente osamente adoramente abilidade "
       "atividade icidade").split()
)

italian.probe_suffixes = (
    _IT_S1 + _IT_STEP2
    + ("azione atore logia uzione usione enza amento imento amente ità "
       "ivo iva gliela sene mela cene vela ci gli la le li lo mi ne si "
       "ti vi ando endo ar er ir a e i o à è ì ò ch gh icamente "
       "osamente abilmente atività icità ichi aggio ssero").split()
)

romanian.probe_suffixes = (
    _RO_STEP2 + _RO_STEP3
    + ("ul ului aua ea ele elor ii iua iei iile iilor ilor ile atei aţie "
       "aţia abilitate ibilitate ivitate icitate icator ical ativ aţiune "
       "atoare ător itiv iţiune itoare iune iuni ism isme ist istă işti "
       "seserăţi sese se sei a e i ie ă ș ț ație ițiune").split()
)

finnish.probe_suffixes = (
    ("han hen hin hon hun hyn hän hön siin den tten seen a ä tta ttä "
     "ta tä ssa ssä sta stä lla llä lta ltä lle na nä ksi ine n "
     "ahan ihin ohon uhun äisiin eiden aitten ooseen eeseen etta että"
     ).split()
    + ("kin kaan kään ko kö han hän pa pä sti si ni nsa nsä mme nne an än "
       "en mpi mpa mpä mmi mma mmä impi imma eja ejä t at ät it ttain "
       "nsakaan ssaan llaan taan ineen isiin oja eineen llänsä immat "
       "impia immalla ksensa ttömättä ttömät").split()
)

hungarian.probe_suffixes = (
    _HU_CASE
    + ("al el án ánként én astul estül ástul éstül stul stül á é oké öké "
       "aké eké ké éi áké áéi éké ééi éé ünk unk nk juk jük uk ük em om "
       "am m od ed ad öd d ja je a e o ánk ájuk ám ád énk éjük ém éd "
       "jaim jeim aim eim im jaid jai ai ei i jaink ink itek jeik ik áim "
       "ái áink áik éim éi éink éik ák ék ök ok ek ak k ball ssal ttel "
       "ünkben jükkel").split()
)

STEMMERS = {
    "english": porter2_stem,
    "danish": danish,
    "norwegian": norwegian,
    "swedish": swedish,
    "german": german,
    "dutch": dutch,
    "russian": russian,
    "french": french,
    "spanish": spanish,
    "portuguese": portuguese,
    "italian": italian,
    "romanian": romanian,
    "finnish": finnish,
    "hungarian": hungarian,
    "turkish": turkish,
    "arabic": arabic,
    "greek": greek,
    "tamil": tamil,
}
