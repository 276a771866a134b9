"""Production-coverage Traditional→Simplified single-character table.

Reference analog: data_processor.py:47-62 runs OpenCC ``t2s`` over every
document before chunking.  This module inlines the single-character
subset of that mapping (the same shape as OpenCC's public TSTCharacters
dictionary) as a data literal, so any Traditional corpus — not just the
engine lexicon the round-2 table covered — converts before extraction.

Scope and caveats (documented, matching OpenCC's own single-char layer):

* single-character mappings only; for ambiguous one-to-many characters
  (e.g. 乾 → 干/乾, 瀋 → 沈) the most common Simplified target is used,
  exactly like OpenCC's TSTCharacters fallback when no phrase rule
  matches.  Corpora needing phrase-level disambiguation should plug a
  real OpenCC instance into the same ``t2s_convert`` hook.
* characters identical in both scripts are omitted (identity mapping).

The table is stored as a flat string of (traditional, simplified) pairs
— two code points per entry — grouped by simplified radical family for
reviewability.
"""

from __future__ import annotations

# fmt: off
_PAIR_GROUPS = (
    # 讠 speech radical
    "計计訂订訃讣認认討讨訓训訊讯記记訛讹訝讶訟讼設设許许訴诉診诊註注"
    "詐诈詔诏評评詛诅詞词詠咏詢询試试詩诗詭诡詳详誇夸誅诛誌志認认誒诶"
    "誕诞誘诱誤误誦诵說说誰谁課课誼谊調调談谈請请諷讽諒谅論论諜谍"
    "諸诸諺谚諾诺謀谋謂谓謊谎謎谜謗谤謙谦講讲謝谢謠谣謹谨證证譏讥"
    "識识譚谭譜谱譯译議议譴谴護护譽誉讀读變变讒谗讓让讚赞訪访誡诫"
    "誨诲諮咨謄誊譁哗讕谰詬诟詮诠詰诘誣诬諱讳諭谕諼谖謬谬",
    # 钅 metal radical
    "釘钉針针釗钊釜釜釣钓鈍钝鈔钞鈕钮鈣钙鈉钠鈞钧鈴铃鉗钳鉛铅鉤钩"
    "銀银銅铜銑铣銘铭銜衔銳锐銷销鋁铝鋤锄鋒锋鋼钢錄录錐锥錘锤錢钱"
    "錦锦錫锡錯错鍍镀鍋锅鍛锻鍵键鎊镑鎖锁鎔镕鎗枪鎚锤鎮镇鏈链鏟铲"
    "鏢镖鏡镜鐘钟鐮镰鐵铁鑄铸鑑鉴鑲镶鑼锣鑽钻鋪铺鎳镍鈿钿鉅巨鍾钟"
    "鏽锈鑒鉴",
    # 纟 silk radical
    "糾纠紀纪約约紅红紉纫紊紊紋纹納纳紐纽純纯紗纱紙纸級级紛纷紜纭"
    "紡纺細细紳绅紹绍終终組组結结絕绝絞绞絡络給给絨绒統统絲丝綁绑"
    "綏绥經经綜综綠绿綢绸維维綱纲網网綴缀緊紧緋绯緒绪緘缄線线緝缉"
    "緞缎締缔緣缘編编緩缓緬缅緯纬練练縛缚縣县縫缝縮缩縱纵總总績绩"
    "繃绷織织繕缮繞绕繡绣繩绳繪绘繫系繳缴繼继續续纏缠纖纤纜缆絢绚"
    "綿绵縷缕繽缤緻致縷缕紈纨絆绊綺绮縊缢縈萦繚缭",
    # 门 gate radical
    "門门閂闩閃闪閉闭開开閏闰閑闲間间閘闸閣阁閥阀閨闺閩闽閱阅閭闾"
    "闊阔闆板闖闯關关闡阐閻阎闢辟闌阑閒闲",
    # 贝 shell radical
    "貝贝貞贞負负財财貢贡貧贫貨货販贩貪贪貫贯責责貯贮貳贰貴贵貶贬"
    "買买貸贷貿贸費费貼贴賀贺賂赂賃赁資资賈贾賊贼賓宾賜赐賞赏賠赔"
    "賢贤賣卖賤贱賦赋質质賬账賭赌賴赖賺赚購购贈赠贊赞贏赢贓赃贖赎"
    "賄贿贅赘貽贻",
    # 车 cart radical
    "車车軌轨軍军軒轩軟软軸轴軛轭較较載载輔辅輕轻輛辆輝辉輩辈輪轮"
    "輸输輯辑轄辖轅辕轉转轎轿轟轰輿舆轍辙軀躯輻辐轂毂",
    # 马 horse radical
    "馬马馮冯馭驭馳驰馴驯駁驳駐驻駒驹駕驾駛驶駟驷駱骆駿骏騁骋騎骑"
    "騙骗騷骚騾骡驅驱驕骄驗验驚惊驟骤騰腾駝驼驢驴驃骠駭骇騫骞",
    # 鱼 fish radical
    "魚鱼魯鲁鮑鲍鮮鲜鯉鲤鯊鲨鯨鲸鰭鳍鰱鲢鱗鳞鱷鳄鰻鳗鮭鲑鱉鳖",
    # 鸟 bird radical
    "鳥鸟鳩鸠鳳凤鳴鸣鴉鸦鴨鸭鴻鸿鴿鸽鵑鹃鵝鹅鵡鹉鵬鹏鶯莺鶴鹤鷗鸥"
    "鷹鹰鷺鹭鸚鹦鷥鸶",
    # 页 page radical
    "頁页頂顶頃顷項项順顺須须頌颂預预頑顽頒颁頓顿頗颇領领頜颌頭头"
    "頰颊頸颈頻频顆颗題题額额顎颚顏颜願愿顛颠類类顧顾顫颤顯显顱颅"
    "頊顼頤颐",
    # 风 / 饣 radicals
    "風风颱台颶飓飄飘颳刮"
    "飢饥飪饪飼饲飽饱飾饰餃饺餅饼養养餓饿餒馁館馆餚肴餵喂餾馏饅馒"
    "饒饶饑饥饋馈飲饮飯饭餐餐饞馋",
    # 氵 water radical
    "漢汉湯汤溝沟沒没沖冲況况洶汹浹浃涇泾澱淀淚泪淺浅清清渙涣減减"
    "測测渾浑湊凑湧涌源源溉溉溫温滄沧滅灭滌涤滬沪滯滞滲渗滴滴滷卤"
    "滾滚滿满漁渔漲涨漸渐潔洁潛潜潤润潰溃澀涩澆浇澇涝澤泽濁浊濕湿"
    "濟济濤涛濫滥濱滨濾滤瀉泻瀋沈瀏浏瀕濒瀝沥瀟潇灌灌灘滩灑洒灣湾"
    "洩泄涼凉淪沦渦涡溼湿潑泼濺溅瀰弥灩滟漬渍滸浒淨净",
    # 火 / 灬 fire radical
    "燈灯燒烧燙烫燜焖營营燦灿燭烛爍烁爐炉爛烂煙烟煉炼煩烦熱热熒荧"
    "熾炽燴烩燻熏爆爆煒炜",
    # 扌 hand radical
    "執执掃扫掄抡掗挜掙挣掛挂採采捨舍捫扪捲卷損损搖摇搗捣搶抢摑掴"
    "摯挚摳抠摟搂撈捞撐撑撓挠撾挝撥拨撫抚撲扑擁拥擋挡擇择擊击擔担"
    "據据擠挤擬拟擰拧擱搁擴扩擲掷擺摆擻擞攏拢攔拦攜携攝摄攤摊攪搅"
    "揀拣揚扬換换揮挥搾榨摺折撣掸擄掳攙搀攆撵拋抛",
    # 木 tree radical
    "機机權权條条東东棄弃楊杨極极榮荣構构槍枪槳桨樁桩樂乐樓楼"
    "標标樞枢樣样樸朴樹树橋桥檔档檜桧檢检檯台櫃柜櫓橹欄栏櫻樱梔栀"
    "棗枣棟栋桿杆橫横檸柠椏桠樑梁櫥橱櫚榈槓杠",
    # 口 mouth radical & phonetic
    "嘆叹吳吴呂吕員员問问啞哑啟启喚唤喪丧喬乔單单嗎吗嗚呜嘔呕嘖啧"
    "嘗尝嘩哗嘮唠嘯啸嘰叽噥哝噸吨噯嗳嚀咛嚇吓嚥咽嚨咙嚮向嚴严嚷嚷"
    "囑嘱唄呗",
    # 亻 person radical
    "億亿儀仪們们倆俩倉仓個个倫伦偉伟側侧偵侦偽伪傑杰傘伞備备傭佣"
    "傳传債债傷伤傾倾僅仅僑侨僱雇價价儂侬儉俭儘尽償偿優优儲储儕侪"
    "倖幸俠侠伕夫",
    # 纟/土/大/女/子/宀 etc mixed common
    "壓压壘垒壙圹壚垆壞坏壟垄壩坝壇坛場场塊块塗涂塢坞塵尘墊垫墜坠"
    "墮堕墾垦壢坜堅坚堊垩"
    "夾夹奪夺奮奋奧奥奬奖"
    "婦妇媽妈嫵妩嫻娴嬌娇嬰婴嬸婶姦奸媧娲"
    "孫孙學学孿孪"
    "宮宫寢寝實实寧宁審审寫写寬宽寵宠寶宝"
    "將将專专尊尊對对導导尋寻"
    "屆届屍尸屜屉屢屡層层屬属屨屦"
    "歲岁峽峡崍崃崗岗嶄崭嶇岖嶺岭嶼屿巒峦巖岩嵐岚"
    "師师帥帅帳帐帶带幀帧幃帏幣币幟帜幫帮幬帱"
    "幹干幾几庫库廁厕廂厢廈厦廚厨廟庙廠厂廢废廣广廳厅廬庐"
    "異异弒弑張张彈弹強强彎弯彙汇彌弥彥彦"
    "徑径從从徠徕復复徹彻"
    "恆恒恥耻悅悦悞误悵怅悶闷惡恶惱恼愛爱愜惬慘惨慚惭慟恸慣惯慫怂"
    "慮虑慾欲憂忧憊惫憐怜憑凭憤愤憲宪憶忆懇恳應应懲惩懶懒懷怀懸悬"
    "懺忏戀恋戇戆態态",
    # 戈/户/日/曰/月
    "戔戋戰战戲戏戶户"
    "時时晉晋晝昼暈晕暉晖暘旸暢畅曆历曉晓曖暧曄晔曇昙曬晒"
    "書书會会"
    "朧胧膚肤脅胁脈脉脹胀腎肾腖胨腡脶腦脑腫肿腳脚膃腽膠胶膩腻膽胆"
    "臉脸臍脐臘腊臚胪臟脏",
    # 欠/止/歹/殳/毛/气
    "歐欧歎叹歟欤歡欢歸归歷历殘残殞殒殲歼殺杀殼壳毀毁氈毡氌氇"
    "氣气氫氢氬氩",
    # 犭/王/瓜/田/疒
    "狀状狹狭狽狈猙狰猶犹獄狱獅狮獎奖獨独獪狯獫猃獸兽獺獭獻献獲获"
    "玆兹現现琺珐琿珲瑋玮瑣琐瑤瑶璉琏瑪玛環环璽玺瓏珑"
    "甌瓯產产畝亩畢毕畫画異异當当疇畴疊叠"
    "瘋疯瘍疡瘓痪瘞瘗瘡疮瘧疟瘤瘤瘺瘘療疗癆痨癇痫癉瘅癌癌癒愈癘疠"
    "癟瘪癡痴癢痒癬癣癱瘫癮瘾痺痹",
    # 皿/目/石/礻/禾/穴/立
    "盃杯盜盗盞盏盡尽監监盤盘盧卢"
    "眥眦眾众睏困睜睁瞘眍瞞瞒矇蒙矓眬矚瞩"
    "矯矫礦矿碼码磚砖磧碛磯矶礎础礙碍確确碩硕砲炮"
    "禮礼禍祸禎祯禱祷祿禄"
    "稈秆種种稱称穀谷稷稷穌稣積积穎颖穡穑穢秽穩稳穫获稅税"
    "窩窝窪洼窮穷窯窑窺窥竄窜竅窍竇窦竊窃"
    "競竞",
    # 竹/米/羊/耒/耳/聿
    "筆笔筍笋箋笺節节範范築筑篋箧篩筛簍篓簑蓑簡简簫箫簽签簾帘籃篮"
    "籌筹籙箓籜箨籟籁籠笼籤签籲吁"
    "糧粮粵粤糞粪糝糁糲粝"
    "羅罗羆罴羈羁罰罚罵骂罷罢羋芈羨羡義义"
    "習习翹翘"
    "聖圣聞闻聯联聰聪聲声聳耸聵聩職职聽听聶聂"
    "肅肃",
    # 舟/艸/虍/虫
    "艙舱艤舣艦舰艫舻"
    "艱艰蘇苏蘋苹蘆芦蘊蕴蘑蘑蘚藓蘭兰藹蔼藻藻藥药藝艺藍蓝藺蔺薦荐"
    "薩萨蕭萧蕩荡蔣蒋蔥葱蓮莲蓽荜蓋盖蒞莅萬万萵莴萊莱菴庵莖茎莢荚"
    "莊庄荊荆蘿萝蘺蓠"
    "虛虚號号虜虏虧亏處处"
    "蟲虫蝦虾螞蚂螢萤融融蟄蛰蟈蝈蟬蝉蟻蚁蠅蝇蠆虿蠍蝎蠑蝾蠟蜡蠣蛎"
    "蠶蚕蠻蛮蛺蛱蜆蚬",
    # 行/衣/见/角/谷/豕
    "術术衛卫衝冲"
    "補补裝装裡里製制複复褲裤褻亵襖袄襪袜襯衬裏里袞衮"
    "見见規规覓觅視视覘觇覡觋覦觎親亲覬觊覯觏覲觐覺觉覽览觀观"
    "觴觞觸触觶觯"
    "豈岂豎竖豐丰豬猪",
    # 走/足/身/辛/辵
    "趕赶趙赵趨趋"
    "躉趸躍跃躊踌躋跻躑踯躒跞躓踬蹌跄蹕跸蹣蹒蹤踪踐践"
    "軀躯"
    "辦办辭辞辮辫辯辩"
    "農农運运這这連连週周進进遊游過过達达違违遙遥遜逊遞递遠远適适"
    "遲迟選选遺遗遼辽邁迈還还邇迩邊边邋邋邏逻遷迁迴回逕径",
    # 阝/钅 place names & misc
    "鄰邻鄭郑鄧邓鄒邹鄔邬鄖郧鄲郸鄉乡"
    "醞酝醜丑醫医醬酱釀酿釁衅釋释"
    "長长"
    "陝陕陣阵陰阴陳陈陸陆陽阳隊队階阶隕陨際际隨随險险隱隐隴陇"
    "雖虽雙双雛雏雜杂離离難难雲云電电霧雾靂雳靄霭靈灵"
    "靜静靚靓"
    "韋韦韌韧韜韬韓韩"
    "韻韵響响頃顷"
    "飛飞"
    "髒脏體体髕髌髖髋"
    "髮发鬆松鬍胡鬚须鬥斗鬧闹鬩阋鬱郁"
    "魎魉魘魇魷鱿"
    "鹵卤鹹咸鹼碱鹽盐"
    "麗丽麥麦麩麸麵面麼么"
    "黃黄點点黨党黷黩黲黪"
    "黽黾黿鼋鼇鳌"
    "齊齐齋斋齒齿齙龅齟龃齡龄齣出齦龈齧啮"
    "龍龙龔龚龕龛龜龟",
    # ambiguous one-to-many characters, most-common target (the phrase
    # layer below carries the exceptions: 乾隆, 角徵羽, 瞭望, …)
    "乾干徵征瞭了餘余隻只傢家嚐尝噹当彆别蔔卜錶表薑姜",
    # frequent standalone simplifications
    "亂乱亞亚佇伫佈布來来侖仑併并兒儿兌兑兩两冊册再再凍冻凜凛凱凯"
    "別别刪删剄刭則则剛刚剋克剎刹剪剪割割創创劃划劇剧劈劈劉刘劊刽"
    "劍剑勁劲動动務务勗勖勘勘勛勋勝胜勞劳勢势勤勤勵励勸劝勻匀匭匦"
    "匯汇區区協协卹恤卻却厭厌參参叢丛葉叶號号嘍喽嚕噜國国圍围"
    "園园圓圆圖图團团聼听垻坝埡垭執执堝埚報报壺壶壹壹壽寿夠够"
    "夢梦夥伙頭头奮奋妝妆姍姗娛娱婁娄嫿婳",
)
# fmt: on


# ---------------------------------------------------------------------------
# Phrase layer (longest-match, applied BEFORE the single-character pass)
# ---------------------------------------------------------------------------
# The same shape as OpenCC's TSPhrases dictionary: a phrase's value is its
# FINAL simplified form — matched spans bypass the character table, so a
# phrase can both (a) protect characters whose most-common single-char
# target would be wrong in this context (乾隆 must keep 乾, not become
# 干隆) and (b) force context-dependent conversions the character layer
# cannot express (看著 → 看着 while 著名 keeps 著).  Keys are
# Traditional; mixed/simplified input simply never matches.
T2S_PHRASES: dict[str, str] = {
    # 乾 qián (hexagram/era/proper names) — protect from 乾→干
    "乾隆": "乾隆", "乾坤": "乾坤", "乾卦": "乾卦", "乾嘉": "乾嘉",
    "乾陵": "乾陵",
    # 徵 zhǐ (the musical note) — protect from 徵→征
    "宮商角徵羽": "宫商角徵羽", "角徵羽": "角徵羽", "變徵": "变徵",
    # 瞭 liào (to watch from afar) — protect from 瞭→了
    "瞭望": "瞭望", "瞭哨": "瞭哨",
    # 著 zhe (aspect particle) → 着; the bare character stays 著
    # (著名/著作/顯著 are the unmarked majority in formal prose)
    "看著": "看着", "跟著": "跟着", "接著": "接着", "隨著": "随着",
    "照著": "照着", "沿著": "沿着", "朝著": "朝着", "向著": "向着",
    "拿著": "拿着", "帶著": "带着", "穿著": "穿着", "忙著": "忙着",
    "急著": "急着", "笑著": "笑着", "坐著": "坐着", "站著": "站着",
    "躺著": "躺着", "挨著": "挨着", "意味著": "意味着",
    "象徵著": "象征着", "本著": "本着", "有著": "有着", "留著": "留着",
    "試著": "试着", "緊接著": "紧接着",
    # 著 zháo/zhāo fixed expressions → 着
    "著急": "着急", "著火": "着火", "著手": "着手", "著眼": "着眼",
    "著陸": "着陆", "著想": "着想", "著涼": "着凉", "著迷": "着迷",
    # 藉 jiè (by means of) → 借; 慰藉/狼藉 keep 藉 via the identity default
    "藉口": "借口", "藉由": "借由", "藉著": "借着", "憑藉": "凭借",
    "藉助": "借助", "藉此": "借此", "藉故": "借故",
}


def _build() -> dict[int, str]:
    table: dict[int, str] = {}
    for group in _PAIR_GROUPS:
        chars = [c for c in group if not c.isspace() and c not in "?？"]
        for i in range(0, len(chars) - 1, 2):
            trad, simp = chars[i], chars[i + 1]
            if trad != simp:
                table[ord(trad)] = simp
    return table


T2S_EXTENDED: dict[int, str] = _build()
