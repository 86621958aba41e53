"""Google SERP locale data — mechanical transcription of
packages/libs/src/data/Google.ts (GoogleParameters): supported_domains
(custom.supported_domains, lines 4-191), languages (193-326), regions
(327-588). Pure data, required verbatim for URL-builder parity; stored
as compact ``key=value`` blocks parsed at import (insertion order
preserved — the region fallback scans in Object.entries order).
"""

ALL_LOCALE = "ZZ"


def _parse(block: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for pair in block.split():
        k, _, v = pair.partition("=")
        out[k] = v
    return out


SUPPORTED_DOMAINS = _parse("""\
AD=www.google.ad AE=www.google.ae AF=www.google.com.af
AG=www.google.com.ag AL=www.google.al AM=www.google.am
AO=www.google.co.ao AR=www.google.com.ar AS=www.google.as
AT=www.google.at AU=www.google.com.au AZ=www.google.az BA=www.google.ba
BD=www.google.com.bd BE=www.google.be BF=www.google.bf BG=www.google.bg
BH=www.google.com.bh BI=www.google.bi BJ=www.google.bj
BN=www.google.com.bn BO=www.google.com.bo BR=www.google.com.br
BS=www.google.bs BT=www.google.bt BW=www.google.co.bw BY=www.google.by
BZ=www.google.com.bz CA=www.google.ca CAT=www.google.cat
CD=www.google.cd CF=www.google.cf CG=www.google.cg CH=www.google.ch
CI=www.google.ci CK=www.google.co.ck CL=www.google.cl CM=www.google.cm
CN=www.google.com.hk CO=www.google.com.co CR=www.google.co.cr
CU=www.google.com.cu CV=www.google.cv CY=www.google.com.cy
CZ=www.google.cz DE=www.google.de DJ=www.google.dj DK=www.google.dk
DM=www.google.dm DO=www.google.com.do DZ=www.google.dz
EC=www.google.com.ec EE=www.google.ee EG=www.google.com.eg
ES=www.google.es ET=www.google.com.et FI=www.google.fi
FJ=www.google.com.fj FM=www.google.fm FR=www.google.fr GA=www.google.ga
GE=www.google.ge GG=www.google.gg GH=www.google.com.gh
GI=www.google.com.gi GL=www.google.gl GM=www.google.gm GR=www.google.gr
GT=www.google.com.gt GY=www.google.gy HK=www.google.com.hk
HN=www.google.hn HR=www.google.hr HT=www.google.ht HU=www.google.hu
ID=www.google.co.id IE=www.google.ie IL=www.google.co.il
IM=www.google.im IN=www.google.co.in IQ=www.google.iq IS=www.google.is
IT=www.google.it JE=www.google.je JM=www.google.com.jm JO=www.google.jo
JP=www.google.co.jp KE=www.google.co.ke KG=www.google.kg
KH=www.google.com.kh KI=www.google.ki KR=www.google.co.kr
KW=www.google.com.kw KZ=www.google.kz LA=www.google.la
LB=www.google.com.lb LI=www.google.li LK=www.google.lk
LS=www.google.co.ls LT=www.google.lt LU=www.google.lu LV=www.google.lv
LY=www.google.com.ly MA=www.google.co.ma MD=www.google.md
ME=www.google.me MG=www.google.mg MK=www.google.mk ML=www.google.ml
MM=www.google.com.mm MN=www.google.mn MT=www.google.com.mt
MU=www.google.mu MV=www.google.mv MW=www.google.mw MX=www.google.com.mx
MY=www.google.com.my MZ=www.google.co.mz NA=www.google.com.na
NE=www.google.ne NG=www.google.com.ng NI=www.google.com.ni
NL=www.google.nl NO=www.google.no NP=www.google.com.np NR=www.google.nr
NU=www.google.nu NZ=www.google.co.nz OM=www.google.com.om
PA=www.google.com.pa PE=www.google.com.pe PG=www.google.com.pg
PH=www.google.com.ph PK=www.google.com.pk PL=www.google.pl
PN=www.google.pn PR=www.google.com.pr PS=www.google.ps PT=www.google.pt
PY=www.google.com.py QA=www.google.com.qa RO=www.google.ro
RS=www.google.rs RU=www.google.ru RW=www.google.rw SA=www.google.com.sa
SB=www.google.com.sb SC=www.google.sc SE=www.google.se
SG=www.google.com.sg SH=www.google.sh SI=www.google.si SK=www.google.sk
SL=www.google.com.sl SM=www.google.sm SN=www.google.sn SO=www.google.so
SR=www.google.sr ST=www.google.st SV=www.google.com.sv TD=www.google.td
TG=www.google.tg TH=www.google.co.th TJ=www.google.com.tj
TL=www.google.tl TM=www.google.tm TN=www.google.tn TO=www.google.to
TR=www.google.com.tr TT=www.google.tt TW=www.google.com.tw
TZ=www.google.co.tz UA=www.google.com.ua UG=www.google.co.ug
UK=www.google.co.uk UY=www.google.com.uy UZ=www.google.co.uz
VC=www.google.com.vc VE=www.google.co.ve VI=www.google.co.vi
VN=www.google.com.vn VU=www.google.vu WS=www.google.ws
ZA=www.google.co.za ZM=www.google.co.zm ZW=www.google.co.zw
""")

LANGUAGES = _parse("""\
af=lang_af ak=lang_ak am=lang_am ar=lang_ar az=lang_az be=lang_be
bem=lang_bem bg=lang_bg bn=lang_bn br=lang_br bs=lang_bs ca=lang_ca
ceb=lang_ceb chr=lang_chr ckb=lang_ckb co=lang_co cs=lang_cs cy=lang_cy
da=lang_da de=lang_de ee=lang_ee el=lang_el en=lang_en eo=lang_eo
es=lang_es et=lang_et eu=lang_eu fa=lang_fa fi=lang_fi fil=lang_fil
fo=lang_fo fr=lang_fr fy=lang_fy ga=lang_ga gaa=lang_gaa gd=lang_gd
gl=lang_gl gn=lang_gn gu=lang_gu ha=lang_ha haw=lang_haw he=lang_iw
hi=lang_hi hr=lang_hr hu=lang_hu hy=lang_hy ia=lang_ia id=lang_id
ig=lang_ig is=lang_is it=lang_it ja=lang_ja jv=lang_jw ka=lang_ka
kk=lang_kk km=lang_km kn=lang_kn ko=lang_ko ky=lang_ky la=lang_la
lg=lang_lg ln=lang_ln lo=lang_lo lt=lang_lt lv=lang_lv mfe=lang_mfe
mg=lang_mg mi=lang_mi mk=lang_mk ml=lang_ml mn=lang_mn mr=lang_mr
ms=lang_ms mt=lang_mt my=lang_my nb=lang_no ne=lang_ne nl=lang_nl
nn=lang_nn nso=lang_nso ny=lang_ny nyn=lang_nyn oc=lang_oc om=lang_om
or=lang_or pa=lang_pa pcm=lang_pcm pl=lang_pl ps=lang_ps pt=lang_pt-BR
qu=lang_qu rm=lang_rm rn=lang_rn ro=lang_ro ru=lang_ru rw=lang_rw
sd=lang_sd si=lang_si sk=lang_sk sl=lang_sl sn=lang_sn so=lang_so
sq=lang_sq sr=lang_sr sr_Latn=lang_sr-ME st=lang_st su=lang_su
sv=lang_sv sw=lang_sw ta=lang_ta te=lang_te tg=lang_tg th=lang_th
ti=lang_ti tk=lang_tk tn=lang_tn to=lang_to tr=lang_tr tt=lang_tt
ug=lang_ug uk=lang_uk ur=lang_ur uz=lang_uz vi=lang_vi wo=lang_wo
xh=lang_xh yi=lang_yi yo=lang_yo zh=lang_zh-CN zh_Hans=lang_zh-CN
zh_Hant=lang_zh-TW zu=lang_zu
""")

REGIONS = _parse("""\
af-ZA=ZA ak-GH=GH ar-AE=AE ar-BH=BH ar-DJ=DJ ar-DZ=DZ ar-EG=EG ar-IL=IL
ar-IQ=IQ ar-JO=JO ar-KW=KW ar-LB=LB ar-LY=LY ar-MA=MA ar-OM=OM ar-PS=PS
ar-QA=QA ar-SA=SA ar-SO=SO ar-TD=TD ar-TN=TN be-BY=BY bg-BG=BG bn-IN=IN
bs-BA=BA ca-AD=AD ca-ES=ES ceb-PH=PH ckb-IQ=IQ cs-CZ=CZ cy-GB=GB
da-DK=DK de-AT=AT de-BE=BE de-CH=CH de-DE=DE de-LI=LI de-LU=LU ee-GH=GH
el-CY=CY el-GR=GR en-AG=AG en-AS=AS en-AU=AU en-BI=BI en-BS=BS en-BW=BW
en-BZ=BZ en-CA=CA en-CK=CK en-CM=CM en-DM=DM en-FJ=FJ en-FM=FM en-GB=GB
en-GG=GG en-GH=GH en-GI=GI en-GM=GM en-GY=GY en-HK=HK en-IE=IE en-IM=IM
en-IN=IN en-JE=JE en-JM=JM en-KE=KE en-KI=KI en-LS=LS en-MG=MG en-MT=MT
en-MU=MU en-MW=MW en-NA=NA en-NG=NG en-NR=NR en-NU=NU en-NZ=NZ en-PG=PG
en-PH=PH en-PK=PK en-PN=PN en-PR=PR en-RW=RW en-SB=SB en-SC=SC en-SG=SG
en-SH=SH en-SL=SL en-TO=TO en-TT=TT en-TZ=TZ en-UG=UG en-US=US en-VC=VC
en-VI=VI en-VU=VU en-WS=WS en-ZA=ZA en-ZM=ZM en-ZW=ZW es-AR=AR es-BO=BO
es-CL=CL es-CO=CO es-CR=CR es-CU=CU es-DO=DO es-EC=EC es-ES=ES es-GT=GT
es-HN=HN es-MX=MX es-NI=NI es-PA=PA es-PE=PE es-PR=PR es-PY=PY es-SV=SV
es-US=US es-UY=UY es-VE=VE et-EE=EE eu-ES=ES fa-AF=AF fi-FI=FI fil-PH=PH
fr-BE=BE fr-BF=BF fr-BI=BI fr-BJ=BJ fr-CA=CA fr-CD=CD fr-CF=CF fr-CG=CG
fr-CH=CH fr-CI=CI fr-CM=CM fr-DJ=DJ fr-DZ=DZ fr-FR=FR fr-GA=GA fr-HT=HT
fr-LU=LU fr-MA=MA fr-MG=MG fr-ML=ML fr-MU=MU fr-NE=NE fr-RW=RW fr-SC=SC
fr-SN=SN fr-TD=TD fr-TG=TG fr-TN=TN fr-VU=VU fy-NL=NL ga-GB=GB ga-IE=IE
gaa-GH=GH gd-GB=GB gl-ES=ES gn-PY=PY gu-IN=IN haw-US=US he-IL=IL
hi-IN=IN hr-BA=BA hr-HR=HR hu-HU=HU hy-AM=AM id-ID=ID is-IS=IS it-CH=CH
it-IT=IT it-SM=SM ja-JP=JP kk-KZ=KZ kn-IN=IN ko-KR=KR ky-KG=KG ln-CD=CD
lt-LT=LT lv-LV=LV mg-MG=MG mi-NZ=NZ ml-IN=IN mr-IN=IN ms-SG=SG mt-MT=MT
nb-NO=NO ne-IN=IN nl-BE=BE nl-NL=NL nl-SR=SR nn-NO=NO nso-ZA=ZA ny-MW=MW
oc-ES=ES or-IN=IN pa-IN=IN pl-PL=PL ps-AF=AF pt-AO=AO pt-BR=BR pt-CV=CV
pt-MZ=MZ pt-PT=PT pt-ST=ST pt-TL=TL qu-BO=BO qu-EC=EC qu-PE=PE rm-CH=CH
rn-BI=BI ro-MD=MD ro-RO=RO ru-BY=BY ru-KG=KG ru-KZ=KZ ru-RU=RU ru-UA=UA
rw-RW=RW sd-IN=IN sk-SK=SK sl-SI=SI sn-ZW=ZW so-SO=SO sr-BA=BA sr-RS=RS
st-LS=LS st-ZA=ZA sv-FI=FI sv-SE=SE sw-CD=CD sw-KE=KE sw-TZ=TZ sw-UG=UG
ta-IN=IN ta-SG=SG te-IN=IN th-TH=TH tn-BW=BW tn-ZA=ZA to-TO=TO tr-CY=CY
tr-TR=TR tt-RU=RU uk-UA=UA ur-IN=IN ur-PK=PK vi-VN=VN wo-SN=SN xh-ZA=ZA
yo-NG=NG zh-CN=HK zh-HK=HK zh-SG=SG zh-TW=TW zu-ZA=ZA
""")
